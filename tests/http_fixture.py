"""In-process HTTP server serving a genweb synthetic web for the
real-socket fetch stage (crawler_spark/plans/fetch_http.py).

Runs as an HTTP *proxy*: the engine sets `config.proxy` to this server's
address, so requests arrive carrying the absolute URL
(`GET http://hostN.example.org/pX HTTP/1.1`) exactly as http-client's
addProxy sends them (src/Request.hs:38-44) — no DNS tricks needed for
the synthetic hostnames. Responses:

- redirect source URL → 301 + Location (the engine follows manually);
- document URL → 200 with the span list as JSON;
- anything else → 404 (engine: "Fetch failed").
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class SyntheticWebServer:
    def __init__(self, web: dict):
        docs = {
            r["doc_id"]: list(r["spans"]) for _, r in web["documents"].iterrows()
        }
        redirects = {
            r["src_url"]: r["dst_url"] for _, r in web["redirects"].iterrows()
        }
        seen_headers: list[dict] = []  # (url, ua, cookie) per request, for assertions

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def do_GET(self):  # noqa: N802
                url = self.path  # absolute-URI form (proxy request)
                seen_headers.append(
                    {
                        "url": url,
                        "user_agent": self.headers.get("User-Agent"),
                        "cookie": self.headers.get("Cookie"),
                    }
                )
                if url in redirects:
                    self.send_response(301)
                    self.send_header("Location", redirects[url])
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                spans = docs.get(url)
                if spans is None:
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                body = json.dumps(spans).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):  # noqa: N802 — form submissions
                # reconstruct the POST fetch key (action\x00body) the
                # synthetic web stores result pages under
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n).decode()
                key = self.path + "\x00" + body
                seen_headers.append(
                    {
                        "url": key,
                        "user_agent": self.headers.get("User-Agent"),
                        "cookie": self.headers.get("Cookie"),
                        "method": "POST",
                    }
                )
                spans = docs.get(key)
                if spans is None:
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                out = json.dumps(spans).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

            def log_message(self, *a):  # quiet
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.requests = seen_headers
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)

    @property
    def proxy_addr(self) -> str:
        host, port = self.server.server_address
        return f"{host}:{port}"

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.server.shutdown()
        self.server.server_close()


class HtmlWebServer:
    """Proxy-style server for REAL tag-soup pages (Content-Type:
    text/html), exercising the HTML→spans production seam in
    plans/fetch_http.py. `pages` maps absolute URL (or POST fetch key
    `action\\x00body`) → HTML string; `redirects` maps URL → Location."""

    def __init__(self, pages: dict, redirects: dict | None = None):
        redirects = dict(redirects or {})

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def _serve(self, key: str):
                if key in redirects:
                    self.send_response(301)
                    self.send_header("Location", redirects[key])
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                html = pages.get(key)
                if html is None:
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                body = html.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                self._serve(self.path)

            def do_POST(self):  # noqa: N802
                n = int(self.headers.get("Content-Length") or 0)
                self._serve(self.path + "\x00" + self.rfile.read(n).decode())

            def log_message(self, *a):  # quiet
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)

    @property
    def proxy_addr(self) -> str:
        host, port = self.server.server_address
        return f"{host}:{port}"

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.server.shutdown()
        self.server.server_close()
