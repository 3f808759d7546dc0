"""REST API — EP3 parity (reference `api/LightningEndPoints.scala`).

Endpoints (reference :53-168):
- POST /api/q    {"query": sql}  -> JSON array of row objects, streamed
- GET  /api/qdq?name=..&table=..&validity=valid|invalid&limit=n
- GET  /api/edq?name=..&table=..&validity=...   (full export)

Row encoding mirrors `rowToJson` (:187-254): binary -> base64,
timestamps/dates ISO-formatted, struct -> object, map<string,_> ->
object, arrays -> lists.

Implementation: stdlib http.server (no web framework in the container)
+ `df.toLocalIterator()` so only one partition is resident on the
driver at a time — the reference makes the same choice to avoid OOM
(comment at `DataQualitySpec.scala:612`).
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
import threading
from itertools import chain
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def encode_value(v):
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, dict):
        return {str(k): encode_value(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [encode_value(x) for x in v]
    if hasattr(v, "asDict"):  # Row (struct)
        return {k: encode_value(x) for k, x in v.asDict().items()}
    return v


def rows_from_df(df):
    """Row iterator for streaming. Pulling the FIRST row eagerly (in
    _respond_df) forces execution of the first partition before any HTTP
    status line is sent, so runtime errors (not just analysis errors)
    still produce a clean 400."""
    return df.toLocalIterator()


def rows_to_json_stream(df, write):
    """Stream a DataFrame as a JSON array using toLocalIterator —
    one partition in driver memory at a time."""
    write(b"[")
    first = True
    for row in df.toLocalIterator():
        if not first:
            write(b",")
        first = False
        obj = {k: encode_value(v) for k, v in row.asDict().items()}
        write(json.dumps(obj).encode("utf-8"))
    write(b"]")


class LightningAPIServer:
    """Minimal threaded HTTP server over a LightningContext."""

    def __init__(self, ctx, host: str = "127.0.0.1", port: int = 0):
        self.ctx = ctx
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silent
                pass

            def _respond_df(self, df):
                # Execute up to the first row BEFORE emitting the status
                # line: Spark evaluates lazily, so without this a
                # runtime failure would surface mid-stream after "200"
                # is already on the wire.
                sentinel = object()
                try:
                    rows = rows_from_df(df)
                    first = next(rows, sentinel)
                except Exception as e:
                    return self._error(400, str(e)[:500])
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Access-Control-Allow-Origin", "*")
                self.end_headers()
                write = self.wfile.write
                try:
                    write(b"[")
                    if first is not sentinel:
                        for i, row in enumerate(chain([first], rows)):
                            if i:
                                write(b",")
                            obj = {k: encode_value(v)
                                   for k, v in row.asDict().items()}
                            write(json.dumps(obj).encode("utf-8"))
                    write(b"]")
                except BrokenPipeError:
                    pass
                except Exception:
                    # headers are already sent: abort the connection
                    # (client sees truncated JSON) — writing a second
                    # status line into the body would corrupt the reply
                    self.close_connection = True

            def _error(self, code: int, msg: str):
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": msg}).encode())

            def do_POST(self):
                if urlparse(self.path).path != "/api/q":
                    return self._error(404, "unknown endpoint")
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(length) or b"{}")
                    query = body.get("query")
                    if not query:
                        return self._error(400, "missing 'query'")
                    self._respond_df(outer.ctx.sql(query))
                except BrokenPipeError:
                    pass
                except Exception as e:
                    self._error(400, str(e)[:500])

            def do_GET(self):
                u = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                try:
                    if u.path in ("/api/qdq", "/api/edq"):
                        name, table = q.get("name"), q.get("table")
                        if not name or not table:
                            return self._error(400, "missing name/table")
                        valid = q.get("validity", "valid") == "valid"
                        limit = (f" LIMIT {int(q['limit'])}"
                                 if u.path == "/api/qdq" and "limit" in q else "")
                        sql = (f"SHOW DQ {'VALID' if valid else 'INVALID'} "
                               f"RECORD {name} TABLE {table}{limit}")
                        self._respond_df(outer.ctx.sql(sql))
                    else:
                        self._error(404, "unknown endpoint")
                except BrokenPipeError:
                    pass
                except Exception as e:
                    self._error(400, str(e)[:500])

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread: threading.Thread | None = None

    def start(self) -> "LightningAPIServer":
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
