"""End-to-end serving benchmark: HTTP POST -> face detect -> TPU translate.

Measures the full web-serving pipeline (twingan_tpu/serve) against a trained
checkpoint: concurrent clients POST real demo faces to the ThreadingHTTPServer
and we report throughput + latency percentiles, with and without the
request-coalescing TPU batch queue (BatchingLocalClient). The reference
serves each face as an individual gRPC predict with no published numbers
(/root/reference/interface/server.py:67-265).

    python tools/serve_bench.py --model_path /tmp/qc/train/64 \
        --images_dir /root/reference/demo/inference_input/cropped
"""

import argparse
import io
import json
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _post(port: int, body: bytes) -> dict:
    import urllib.request

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/", data=body,
        headers={"Content-Type": "image/png"},
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        return json.loads(resp.read())


def run_config(args, serve_batch: int, bodies: list) -> dict:
    from http.server import ThreadingHTTPServer

    from twingan_tpu.serve.server import build_service, make_handler

    service = build_service(argparse.Namespace(
        debug=args.debug, serving_url="", model_path=args.model_path,
        image_hw=args.image_hw, direction="s2t",
        output_dir=os.path.join(args.work, f"out_b{serve_batch}"),
        waifu2x_url="", max_faces=4, serve_batch=serve_batch,
        detector_procs=args.detector_procs,
    ))
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        _post(port, bodies[0])  # warm: jit compile through the tunnel
        lat: list = []
        t0 = time.time()
        with ThreadPoolExecutor(args.concurrency) as pool:
            def one(i):
                s = time.time()
                r = _post(port, bodies[i % len(bodies)])
                assert r["status"] == "success" and r["num_faces"] >= 1, r
                return time.time() - s
            lat = list(pool.map(one, range(args.requests)))
        wall = time.time() - t0
        return {
            "serve_batch": serve_batch,
            "requests": args.requests,
            "concurrency": args.concurrency,
            "requests_per_sec": round(args.requests / wall, 2),
            "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1000, 1),
            "latency_p95_ms": round(float(np.percentile(lat, 95)) * 1000, 1),
        }
    finally:
        server.shutdown()
        if hasattr(service.client, "close"):
            service.client.close()
        service.detector.close()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", default="",
                   help="trained TwinGAN stage dir (config.json + ckpt)")
    p.add_argument("--debug", action="store_true",
                   help="mock client (no checkpoint/TPU): measures the host "
                        "pipeline (decode -> detect -> encode) in isolation")
    p.add_argument("--detector_procs", type=int, default=0,
                   help="Haar detection worker processes (0 = request thread)")
    p.add_argument("--images_dir",
                   default="/root/reference/demo/inference_input/cropped")
    p.add_argument("--image_hw", type=int, default=0)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--work", default="/tmp/serve_bench")
    args = p.parse_args(argv)
    if not args.debug and not args.model_path:
        p.error("--model_path required (or --debug for the host pipeline)")

    bodies = []
    for name in sorted(os.listdir(args.images_dir)):
        if name.lower().endswith((".png", ".jpg", ".jpeg")):
            with open(os.path.join(args.images_dir, name), "rb") as f:
                bodies.append(f.read())
    assert bodies, f"no images in {args.images_dir}"

    for serve_batch in (1, 8, 16):
        print(json.dumps(run_config(args, serve_batch, bodies)), flush=True)


if __name__ == "__main__":
    main()
