"""HTTP serving frontend: upload a photo, get translated face(s) back.

Reference parity: /root/reference/interface/server.py — POST multipart image
-> save -> face detect/crop -> per-face translate -> optional waifu2x 2x
upscale -> side-by-side combine -> JSON response; GET serves the static
frontend and generated images; automatic retry wrapper (:203-217) becomes
plain exception handling per request (no shared TF session to wedge).

Run:
    python -m twingan_tpu.serve.server --model_path=/trained --port=8222
    python -m twingan_tpu.serve.server --debug --port=8222   # mock model
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np
from PIL import Image as PILImage

from twingan_tpu.serve.clients import (
    BatchingLocalClient,
    LocalTwinGANClient,
    MockTwinGANClient,
    RemoteTwinGANClient,
    Waifu2xClient,
)
from twingan_tpu.serve.face_detection import FaceDetector
from twingan_tpu.utils.image_io import imsave_float

STATIC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "static")
MAX_UPLOAD_BYTES = 16 << 20


class _AsyncImageWriter:
    """Single background thread that drains PNG encode+write work off the
    request critical path. On this one-core host the encode can't run in
    parallel with other Python work, but deferring it means it fills the
    idle gaps while request threads block on the TPU tunnel — and the
    client gets its JSON before the ~35-180 ms/image encode instead of
    after. Files land atomically (tmp + rename) so the GET-side file
    polling (reference server.py:250-259) never serves a half-written PNG."""

    def __init__(self):
        import queue

        self._q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                path, arr = item
                # Keep the .png suffix so PIL can infer the encoder.
                tmp = f"{path}.{threading.get_ident()}.tmp.png"
                imsave_float(tmp, arr, fast=True)
                os.replace(tmp, path)
            except Exception as e:  # noqa: BLE001 — never kill the writer
                print(f"async image write failed for {item and item[0]}: {e}")
            finally:
                self._q.task_done()

    def submit(self, path: str, arr: np.ndarray) -> None:
        self._q.put((path, arr))

    def join(self) -> None:
        """Block until every submitted image is on disk (tests, shutdown)."""
        self._q.join()


class TranslationService:
    """The request pipeline, shared by all handler threads."""

    def __init__(self, client, detector: FaceDetector, output_dir: str,
                 waifu2x: Optional[Waifu2xClient] = None, max_faces: int = 4,
                 defer_writes: bool = True):
        self.client = client
        self.detector = detector
        self.output_dir = output_dir
        self.waifu2x = waifu2x
        self.max_faces = max_faces
        self._lock = threading.Lock()
        self.writer = _AsyncImageWriter() if defer_writes else None
        os.makedirs(output_dir, exist_ok=True)

    def _save(self, path: str, arr: np.ndarray) -> None:
        if self.writer is not None:
            self.writer.submit(path, arr)
        else:
            imsave_float(path, arr, fast=True)

    def handle_image(self, image: np.ndarray) -> dict:
        t0 = time.time()
        request_id = uuid.uuid4().hex[:16]
        faces = self.detector.crop_faces(image)[: self.max_faces]
        outputs = []
        for i, face in enumerate(faces):
            if isinstance(self.client, BatchingLocalClient):
                translated = self.client.do_inference(face)  # queue batches
            else:
                with self._lock:  # one TPU dispatch at a time
                    translated = self.client.do_inference(face)
            if self.waifu2x is not None:
                upscaled = self.waifu2x.post_request(translated)
                if upscaled is not None:
                    translated = upscaled
            # Side-by-side combine (reference server.py:242-252).
            hw = translated.shape[0]
            face_resized = np.asarray(
                PILImage.fromarray(face).resize((hw, hw), PILImage.BILINEAR), np.float32
            ) / 255.0
            combined = np.concatenate([face_resized, translated], axis=1)
            name = f"{request_id}_{i}.png"
            self._save(os.path.join(self.output_dir, name), combined)
            translated_name = f"{request_id}_{i}_translated.png"
            self._save(os.path.join(self.output_dir, translated_name), translated)
            outputs.append({"combined": f"/outputs/{name}",
                            "translated": f"/outputs/{translated_name}"})
        return {
            "status": "success",
            "request_id": request_id,
            "num_faces": len(faces),
            "outputs": outputs,
            "latency_sec": round(time.time() - t0, 3),
        }


def _parse_multipart_image(body: bytes, content_type: str) -> Optional[np.ndarray]:
    m = re.search(r'boundary="?([^";,]+)"?', content_type)
    if not m:
        return None
    boundary = ("--" + m.group(1)).encode()
    for part in body.split(boundary):
        if b"\r\n\r\n" not in part:
            continue
        headers, payload = part.split(b"\r\n\r\n", 1)
        if b"filename=" not in headers and b"image" not in headers.lower():
            continue
        payload = payload.rstrip(b"\r\n-")
        try:
            img = PILImage.open(io.BytesIO(payload))
            return np.asarray(img.convert("RGB"), np.uint8)
        except Exception:
            continue
    return None


def make_handler(service: TranslationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path in ("/", "/index.html"):
                self._file(os.path.join(STATIC_DIR, "index.html"), "text/html")
            elif path == "/index_webcam.html":
                # Webcam capture page (reference index_webcam.html).
                self._file(os.path.join(STATIC_DIR, "index_webcam.html"), "text/html")
            elif path.startswith("/outputs/"):
                # Output PNGs are written asynchronously after the POST's
                # JSON answer; poll briefly for late files exactly like the
                # reference frontend/server pair (server.py:250-259 polls
                # the generated file before answering).
                name = os.path.basename(path)
                full = os.path.join(service.output_dir, name)
                deadline = time.time() + 3.0
                while (service.writer is not None and not os.path.exists(full)
                       and time.time() < deadline):
                    time.sleep(0.02)
                self._file(full, "image/png")
            elif path == "/healthz":
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"status": "not_found"})

        def _file(self, path: str, ctype: str):
            if not os.path.exists(path):
                self._json(404, {"status": "not_found"})
                return
            with open(path, "rb") as f:
                data = f.read()
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0 or length > MAX_UPLOAD_BYTES:
                    self._json(400, {"status": "error", "message": "bad content length"})
                    return
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                image = None
                if ctype.startswith("multipart/form-data"):
                    image = _parse_multipart_image(body, ctype)
                elif ctype.startswith("image/"):
                    image = np.asarray(PILImage.open(io.BytesIO(body)).convert("RGB"), np.uint8)
                elif ctype.startswith("application/json"):
                    from twingan_tpu.utils.image_io import base64_to_numpy

                    payload = json.loads(body)
                    image = base64_to_numpy(payload["image"])
                    if payload.get("detect_face"):
                        # Face-detection preview mode (reference server.py:86-95
                        # 'detectFace'): return the marked image, don't translate.
                        from twingan_tpu.utils.image_io import numpy_to_base64

                        marked, found = service.detector.mark_face(image)
                        self._json(200, {
                            "status": "success",
                            "image": numpy_to_base64(marked),
                            "face_found": found,
                        })
                        return
                if image is None:
                    self._json(400, {"status": "error", "message": "no image found in request"})
                    return
                self._json(200, service.handle_image(image))
            except Exception as e:  # noqa: BLE001 — always answer the client
                self._json(500, {"status": "error", "message": str(e)})

    return Handler


def build_service(args) -> TranslationService:
    if args.debug:
        client = MockTwinGANClient(image_hw=args.image_hw or 64)
    elif args.serving_url:
        client = RemoteTwinGANClient(args.serving_url, image_hw=args.image_hw or 256)
    else:
        local = LocalTwinGANClient(args.model_path, args.image_hw,
                                   args.direction,
                                   quantize=getattr(args, "quantize", False))
        client = BatchingLocalClient(local.inferer, max_batch=args.serve_batch) \
            if args.serve_batch > 1 else local
    waifu2x = Waifu2xClient(args.waifu2x_url) if args.waifu2x_url else None
    procs = getattr(args, "detector_procs", 0)
    if procs > 0:
        from twingan_tpu.serve.face_detection import PooledFaceDetector

        detector = PooledFaceDetector(num_procs=procs, max_faces=args.max_faces)
    else:
        detector = FaceDetector(max_faces=args.max_faces)
    return TranslationService(client, detector, args.output_dir, waifu2x,
                              args.max_faces,
                              defer_writes=not getattr(args, "sync_writes", False))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", default="")
    p.add_argument("--serving_url", default="", help="TF-Serving REST endpoint (remote mode)")
    p.add_argument("--image_hw", type=int, default=0)
    p.add_argument("--direction", default="s2t", choices=["s2t", "t2s"])
    p.add_argument("--port", type=int, default=8222)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--output_dir", default="/tmp/twingan_serve_outputs")
    p.add_argument("--waifu2x_url", default="")
    p.add_argument("--max_faces", type=int, default=4)
    p.add_argument("--serve_batch", type=int, default=8,
                   help="coalesce concurrent requests into one TPU batch (1 disables)")
    p.add_argument("--detector_procs", type=int, default=0,
                   help="run Haar detection in N worker processes so "
                        "concurrent requests detect on separate cores "
                        "(0 = in the request thread)")
    p.add_argument("--sync_writes", action="store_true",
                   help="write output PNGs on the request thread before "
                        "answering (default: deferred to a writer thread; "
                        "the GET side polls for late files)")
    p.add_argument("--quantize", action="store_true",
                   help="serve the W8A8 int8 conv path (ops/quant.py); "
                   "scales self-calibrate on the first request batch")
    p.add_argument("--debug", action="store_true", help="mock model (no checkpoint needed)")
    args = p.parse_args(argv)
    if not args.debug and not args.serving_url and not args.model_path:
        p.error("--model_path required (or --debug / --serving_url)")

    service = build_service(args)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    print(f"serving on http://{args.host}:{args.port} "
          f"(mode={'mock' if args.debug else 'remote' if args.serving_url else 'local'})")
    server.serve_forever()


if __name__ == "__main__":
    main()
