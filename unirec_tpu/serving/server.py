"""Minimal JSON-over-HTTP recommendation server.

POST /recommend   {"history": [item_id, ...], "k": 10}
                  -> {"items": [{"item_id": ..., "score": ...}, ...]}
POST /score       {"history": [...], "candidates": [...]}
                  -> {"ranking": [[item_id, score], ...]}
GET  /healthz     -> {"ok": true, "catalog_size": N}

Single-threaded stdlib server: requests are batched per call by the
Recommender's fixed-shape jit forward; for production fan-out put a real
frontend in front and scale via the dp mesh.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, HTTPServer

from unirec_tpu.serving.recommender import Recommender


def make_handler(recommender: Recommender):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._send(
                    200,
                    {"ok": True, "catalog_size": len(recommender.catalog_ids)},
                )
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
            except Exception as e:
                self._send(400, {"error": f"bad json: {e}"})
                return
            try:
                if self.path == "/recommend":
                    history = req.get("history", [])
                    k = int(req.get("k", 10))
                    recs = recommender.recommend([history], k=k)[0]
                    self._send(
                        200,
                        {"items": [
                            {"item_id": r.item_id, "score": r.score}
                            for r in recs
                        ]},
                    )
                elif self.path == "/score":
                    ranking = recommender.score_candidates(
                        req.get("history", []), req.get("candidates", [])
                    )
                    self._send(200, {"ranking": ranking})
                else:
                    self._send(404, {"error": "not found"})
            except Exception as e:
                self._send(500, {"error": str(e)})

    return Handler


def serve(recommender: Recommender, host: str = "127.0.0.1", port: int = 8099):
    server = HTTPServer((host, port), make_handler(recommender))
    print(f"serving on http://{host}:{port}")
    server.serve_forever()
