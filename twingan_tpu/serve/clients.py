"""Translation backends for the web server.

Reference parity: /root/reference/interface/twingan_client.py (gRPC
TF-Serving client + MockTwinGANClient) and interface/waifu2x_interface.py.
- LocalTwinGANClient: in-process ImageInferer — the TPU-native default (no
  separate model-server hop; the checkpoint/export IS the serving unit).
- RemoteTwinGANClient: TF-Serving REST predict call with the reference's
  5-second deadline, for parity with an external tensorflow_model_server
  running the jax2tf SavedModel export.
- MockTwinGANClient: returns a canned image for driving the web stack
  without a model (reference --debug mode).
- Waifu2xClient: optional HTTP 2x upscale hop.
"""

from __future__ import annotations

import io
import json
import urllib.request
from typing import Optional

import numpy as np


class MockTwinGANClient:
    """Fixed-output client (reference MockTwinGANClient :144-153)."""

    def __init__(self, image_hw: int = 64):
        self.image_hw = image_hw
        rng = np.random.RandomState(0)
        self._canned = rng.rand(image_hw, image_hw, 3).astype(np.float32)

    def do_inference(self, image: np.ndarray) -> np.ndarray:
        return self._canned.copy()


class LocalTwinGANClient:
    """Runs the translation in-process on the TPU."""

    def __init__(self, model_path: str, image_hw: int = 0, direction: str = "s2t",
                 quantize: bool = False):
        from twingan_tpu.infer.translate import ImageInferer

        self.inferer = ImageInferer(model_path, image_hw, direction,
                                    quantize=quantize)
        self.image_hw = self.inferer.image_hw

    def do_inference(self, image: np.ndarray) -> np.ndarray:
        return self.inferer.infer_batch([image])[0]


class RemoteTwinGANClient:
    """TF-Serving REST client (reference gRPC PredictRequest with a 5s
    deadline, twingan_client.py:110-137)."""

    def __init__(self, server_url: str, model_name: str = "twingan",
                 image_hw: int = 256, timeout: float = 5.0):
        self.url = f"{server_url.rstrip('/')}/v1/models/{model_name}:predict"
        self.image_hw = image_hw
        self.timeout = timeout

    def do_inference(self, image: np.ndarray) -> np.ndarray:
        from PIL import Image as PILImage

        img = PILImage.fromarray(image).resize((self.image_hw, self.image_hw), PILImage.BILINEAR)
        arr = (np.asarray(img, np.float32) / 255.0)[None].tolist()
        payload = json.dumps({"instances": arr}).encode()
        req = urllib.request.Request(
            self.url, data=payload, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            out = json.loads(resp.read())
        return np.asarray(out["predictions"][0], np.float32)


class Waifu2xClient:
    """HTTP client for an external waifu2x upscaling server (reference
    interface/waifu2x_interface.py:12-55)."""

    def __init__(self, server_url: str, timeout: float = 10.0):
        self.server_url = server_url
        self.timeout = timeout

    def post_request(self, image: np.ndarray, scale: int = 2) -> Optional[np.ndarray]:
        from PIL import Image as PILImage

        buf = io.BytesIO()
        PILImage.fromarray(np.clip(image * 255, 0, 255).astype(np.uint8)).save(buf, format="PNG")
        boundary = "----twinganboundary"
        body = (
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="file"; filename="in.png"\r\n'
            f"Content-Type: image/png\r\n\r\n"
        ).encode() + buf.getvalue() + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"{self.server_url.rstrip('/')}/api?scale={scale}",
            data=body,
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                out = PILImage.open(io.BytesIO(resp.read()))
                return np.asarray(out.convert("RGB"), np.float32) / 255.0
        except Exception:
            return None  # upscaling is best-effort, like the reference


class BatchingLocalClient:
    """Wraps a local client with a request-coalescing queue: concurrent
    requests are batched into one TPU dispatch (up to ``max_batch``, waiting
    at most ``max_wait_ms`` for co-riders). The reference serves each face
    with an individual gRPC predict; batching is where TPU serving
    throughput comes from (docs/PERFORMANCE.md batch sweep)."""

    def __init__(self, inferer, max_batch: int = 16, max_wait_ms: float = 5.0):
        import queue
        import threading

        self.inferer = inferer
        self.image_hw = getattr(inferer, "image_hw", 0)
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        import queue as queue_mod
        import time

        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue_mod.Empty:
                continue
            if first is None:
                return
            batch = [first]
            shutdown = False
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._q.get(timeout=remaining)
                except queue_mod.Empty:
                    break
                if item is None:
                    # Drain-then-stop: the already-collected requests must
                    # still be answered, or their callers hang for the
                    # full future timeout.
                    shutdown = True
                    break
                batch.append(item)
            images = [img for img, _ in batch]
            # Pad to the fixed max_batch so only ONE shape ever compiles
            # (tunnel compiles are expensive; see CLAUDE.md).
            padded = images + [images[-1]] * (self.max_batch - len(images))
            try:
                outs = self.inferer.infer_batch(padded)[: len(images)]
                for (_, fut), out in zip(batch, outs):
                    fut.set_result(out)
            except Exception as e:  # noqa: BLE001
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
            if shutdown:
                return

    def do_inference(self, image: np.ndarray) -> np.ndarray:
        from concurrent.futures import Future

        fut: Future = Future()
        self._q.put((image, fut))
        return fut.result(timeout=300)

    def close(self):
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=5)
