"""In-process mock of the ActiveCampaign v3 REST API for connector tests.

Shapes mirror the real API as used by the reference: collections under
``/api/3/<name>`` with ``limit``/``offset`` pagination, ``meta.total``,
``id_greater`` keyset ordering, ``filters[<field>]`` equality filtering;
child collections under ``/api/3/contacts/<id>/<child>``. Failure
injection: a per-path counter of 429/500 responses before success, and
404 for unknown child endpoints (bounceLogs tolerance path).
"""

from __future__ import annotations

import json
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class MockAC:
    def __init__(self):
        self.collections: dict[str, list[dict]] = {}
        self.children: dict[str, dict[str, list[dict]]] = {}  # child -> parent_id -> rows
        self.fail_first: dict[str, list[int]] = {}  # path -> stack of status codes
        self.request_log: list[str] = []
        self.request_times: list[float] = []  # monotonic stamp per request
        self._server: ThreadingHTTPServer | None = None

    # ----------------------------------------------------------- lifecycle

    def start(self) -> str:
        mock = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def do_GET(self):
                mock.request_log.append(self.path)
                mock.request_times.append(time.monotonic())
                parsed = urllib.parse.urlparse(self.path)
                params = {k: v[0] for k, v in urllib.parse.parse_qs(parsed.query).items()}
                parts = [p for p in parsed.path.split("/") if p]

                # failure injection by bare path
                pending = mock.fail_first.get(parsed.path.split("?")[0])
                if pending:
                    code = pending.pop(0)
                    self.send_response(code)
                    self.end_headers()
                    return

                if len(parts) == 3 and parts[0] == "api":  # /api/3/<coll>
                    name = parts[2]
                    rows = mock.collections.get(name)
                    if rows is None:
                        self.send_response(404); self.end_headers(); return
                    self._respond(name, mock._page(rows, params))
                elif len(parts) == 5 and parts[0] == "api":  # /api/3/contacts/<id>/<child>
                    child = parts[4]
                    table = mock.children.get(child)
                    if table is None:
                        self.send_response(404); self.end_headers(); return
                    rows = table.get(parts[3], [])
                    self._respond(child, mock._page(rows, params))
                else:
                    self.send_response(404); self.end_headers()

            def _respond(self, name, payload):
                rows, total = payload
                body = json.dumps({name: rows, "meta": {"total": total}}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return f"http://127.0.0.1:{self._server.server_port}"

    def stop(self):
        if self._server:
            self._server.shutdown()
            self._server.server_close()

    # ------------------------------------------------------------ querying

    def _page(self, rows: list[dict], params: dict) -> tuple[list[dict], int]:
        out = rows
        for k, v in params.items():
            if k.startswith("filters[") and k.endswith("]"):
                field = k[8:-1]
                out = [r for r in out if str(r.get(field)) == v]
        if "id_greater" in params:
            cur = int(params["id_greater"])
            out = sorted(
                (r for r in out if int(r["id"]) > cur), key=lambda r: int(r["id"])
            )
        total = len(out)
        limit = int(params.get("limit", 20))
        offset = int(params.get("offset", 0))
        return out[offset : offset + limit], total
