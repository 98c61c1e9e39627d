"""Serving / web interface (reference interface/ stack).

- face_detection.py <- interface/face_detection_util.py (frozen-SSD detector
  replaced by OpenCV cascades; same empirical crop-box expansion)
- clients.py        <- interface/twingan_client.py (local / remote / mock)
                       + interface/waifu2x_interface.py
- server.py         <- interface/server.py HTTP POST API + static frontend
"""

from twingan_tpu.serve.face_detection import FaceDetector
from twingan_tpu.serve.clients import LocalTwinGANClient, MockTwinGANClient, RemoteTwinGANClient
