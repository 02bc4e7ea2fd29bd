"""HTTPLoader: byte-range loading over HTTP against a local Range-capable
server fixture (the reference's AjaxLoader.js:20-26 + bin/server-node pair).
Every reader (RAW / ZIP / BVP) must work through it unchanged."""

import http.server
import json
import threading

import numpy as np
import pytest

from vpt_tpu.scene import io
from vpt_tpu.scene.volume import Volume


class _RangeHandler(http.server.BaseHTTPRequestHandler):
    """Minimal static server with HTTP Range support (bin/server-node:10-16
    analog). Serves self.server.payload at every path."""

    def _payload(self):
        return self.server.payload

    def do_HEAD(self):
        self.send_response(200)
        self.send_header("Content-Length", str(len(self._payload())))
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def do_GET(self):
        data = self._payload()
        rng = self.headers.get("Range")
        if rng and rng.startswith("bytes="):
            lo, hi = rng[len("bytes="):].split("-")
            lo = int(lo)
            hi = int(hi) if hi else len(data) - 1
            chunk = data[lo:hi + 1]
            self.send_response(206)
            self.send_header("Content-Range", f"bytes {lo}-{hi}/{len(data)}")
            self.send_header("Content-Length", str(len(chunk)))
            self.end_headers()
            self.wfile.write(chunk)
        else:
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    def log_message(self, *args):
        pass


@pytest.fixture
def serve():
    """Start a local HTTP server for a payload; yields url_for(payload)."""
    servers = []

    def url_for(payload: bytes) -> str:
        srv = http.server.HTTPServer(("127.0.0.1", 0), _RangeHandler)
        srv.payload = payload
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        return f"http://127.0.0.1:{srv.server_address[1]}/volume"

    yield url_for
    for srv in servers:
        srv.shutdown()
        srv.server_close()


def test_http_loader_length_and_ranges(serve):
    payload = bytes(range(256)) * 7
    loader = io.HTTPLoader(serve(payload))
    assert loader.read_length() == len(payload)
    assert loader.read_data(0, 10) == payload[:10]
    assert loader.read_data(300, 555) == payload[300:555]
    assert loader.read_data(5, 5) == b""


def test_http_raw_reader_roundtrip(serve):
    vol = (np.arange(4 * 3 * 2, dtype=np.uint8)).reshape(2, 3, 4)
    loader = io.HTTPLoader(serve(vol.tobytes()))
    reader = io.RAWReader(loader, width=4, height=3, depth=2)
    v = Volume.from_reader(reader)
    np.testing.assert_allclose(v.density, vol.astype(np.float32) / 255.0)


def test_http_bvp_reader_roundtrip(serve, tmp_path):
    # a tiny BVP (stored-only zip with manifest + one block) served over HTTP
    block = np.arange(8, dtype=np.uint8).reshape(2, 2, 2)
    manifest = {
        "modalities": [{
            "name": "default",
            "dimensions": {"width": 2, "height": 2, "depth": 2},
            "placements": [{"index": 0,
                            "position": {"x": 0, "y": 0, "z": 0}}],
        }],
        "blocks": [{
            "url": "blocks/0.raw",
            "dimensions": {"width": 2, "height": 2, "depth": 2},
        }],
    }
    path = str(tmp_path / "vol.bvp")
    io.write_stored_zip(path, {
        "manifest.json": json.dumps(manifest).encode(),
        "blocks/0.raw": block.tobytes(),
    })
    payload = open(path, "rb").read()
    reader = io.BVPReader(io.HTTPLoader(serve(payload)))
    v = Volume.from_reader(reader)
    np.testing.assert_allclose(v.density, block.astype(np.float32) / 255.0)
