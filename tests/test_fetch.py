"""Fetch-layer tests (S7/S12): retry, ignored statuses, auth redirect,
cursor pagination, and fetched-bytes → real-codec decode end-to-end —
all against deterministic fake transports (no network in this runtime)."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from barberini_analytics_spark.multimodal import codecs as C
from barberini_analytics_spark.multimodal import media as M
from barberini_analytics_spark.sources import fetch as FX


class ScriptedTransport:
    """Per-URL scripts: a list of outcomes consumed per attempt.
    'boom' raises; an int is returned as that HTTP status; bytes are a
    200 with that content."""

    def __init__(self, scripts):
        self.scripts = {u: list(s) for u, s in scripts.items()}

    def __call__(self, url):
        step = self.scripts[url].pop(0) if self.scripts.get(url) \
            else b"default"
        if step == "boom":
            raise IOError("transport exploded")
        if isinstance(step, int):
            return FX.FetchResponse(status=step, content=b"", final_url=url)
        if isinstance(step, tuple):  # (content, final_url)
            return FX.FetchResponse(200, step[0], final_url=step[1])
        return FX.FetchResponse(200, step, final_url=url)


def test_fetch_retries_then_succeeds(spark):
    factory = lambda: ScriptedTransport(  # noqa: E731
        {"u1": ["boom", "boom", b"payload"], "u2": [b"fast"]})
    df = spark.createDataFrame([(1, "u1"), (2, "u2")],
                               ["media_id", "url"]).coalesce(1)
    rows = {r.media_id: r for r in FX.fetch_binary(
        df, "url", factory, id_cols=["media_id"], max_attempts=4).collect()}
    assert bytes(rows[1].content) == b"payload" and rows[1].n_attempts == 3
    assert bytes(rows[2].content) == b"fast" and rows[2].n_attempts == 1


def test_fetch_exhausted_retries_raise(spark):
    factory = lambda: ScriptedTransport({"bad": ["boom"] * 9})  # noqa: E731
    df = spark.createDataFrame([(1, "bad")], ["media_id", "url"])
    with pytest.raises(Exception, match="transport exploded"):
        FX.fetch_binary(df, "url", factory, id_cols=["media_id"],
                        max_attempts=3).collect()


def test_fetch_ignored_status_yields_error_row(spark):
    factory = lambda: ScriptedTransport({"gone": [404]})  # noqa: E731
    df = spark.createDataFrame([(1, "gone")], ["media_id", "url"])
    rows = FX.fetch_binary(df, "url", factory, id_cols=["media_id"],
                           ignored_status=[404]).collect()
    assert rows[0].status == 404 and rows[0].content is None


def test_fetch_auth_redirect_fails_loudly(spark):
    factory = lambda: ScriptedTransport(  # noqa: E731
        {"page": [(b"<html>login</html>", "https://x/users/sign_in")]})
    df = spark.createDataFrame([(1, "page")], ["media_id", "url"])
    with pytest.raises(Exception, match="sign_in"):
        FX.fetch_binary(df, "url", factory, id_cols=["media_id"],
                        auth_redirect_suffix="/users/sign_in").collect()


class PagedTransport:
    """Serves JSON pages with paging.next cursors, per key."""

    def __call__(self, url):
        # url scheme: "k<key>/p<page>"; 3 pages per key
        key, page = url.split("/p")
        page = int(page)
        body = {"data": [f"{key}-item{page}"]}
        if page < 2:
            body["paging"] = {"next": f"{key}/p{page + 1}"}
        return FX.FetchResponse(200, json.dumps(body).encode(), url)


def _next_url(content: bytes):
    return json.loads(content).get("paging", {}).get("next")


def test_fetch_paged_walks_cursors_per_key(spark):
    keys = spark.createDataFrame(
        [("a", "ka/p0"), ("b", "kb/p0")], ["key", "first_url"])
    out = FX.fetch_paged(keys, "first_url", PagedTransport, _next_url)
    rows = sorted((r.key, r.page_index, r.url) for r in out.collect())
    assert rows == [("a", 0, "ka/p0"), ("a", 1, "ka/p1"), ("a", 2, "ka/p2"),
                    ("b", 0, "kb/p0"), ("b", 1, "kb/p1"), ("b", 2, "kb/p2")]


def test_fetch_paged_runaway_cursor_raises(spark):
    class Endless:
        def __call__(self, url):
            return FX.FetchResponse(
                200, json.dumps(
                    {"paging": {"next": url}}).encode(), url)

    keys = spark.createDataFrame([("a", "loop")], ["key", "first_url"])
    with pytest.raises(Exception, match="runaway"):
        FX.fetch_paged(keys, "first_url", Endless, _next_url,
                       max_pages=5).collect()


def test_fetched_thumbnail_decodes_end_to_end(spark):
    """S7 full chain: fetch a (real BMP) thumbnail blob → decode_media →
    true dimensions and pixel statistic from the fetched bytes."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
    bmp = C.encode_bmp(img)

    class Thumbs:
        def __call__(self, url):
            return FX.FetchResponse(200, bmp, url)

    posts = spark.createDataFrame(
        [(42, "https://cdn/thumb42.bmp")], ["media_id", "thumbnail_url"])
    fetched = FX.fetch_thumbnails(posts, Thumbs)
    decoded = M.decode_media(
        fetched.select("media_id", F.col("content").alias("data"))).collect()
    (r,) = decoded
    assert (r.container, r.kind, r.width, r.height) == ("bmp", "image", 9, 12)
    luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2]).mean()
    assert r.content_stat == pytest.approx(luma, rel=1e-6)


# ---------------------------------------------------------------------------
# loopback HTTP integration: real sockets through the stdlib transport
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def loopback_server():
    """A stdlib HTTP server on 127.0.0.1 exercising the fetch layer over
    REAL sockets (Spark python workers are separate processes — they
    reach the test-process server via loopback): flaky endpoints that
    recover, an auth redirect chain, cursor pagination, and a 404."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    hits: dict[str, int] = {}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, status, body=b"", headers=()):
            self.send_response(status)
            for k, v in headers:
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            p = self.path
            if p.startswith("/ok/"):
                self._send(200, f"payload:{p.rsplit('/', 1)[1]}".encode())
            elif p.startswith("/flaky/"):
                with lock:
                    hits[p] = hits.get(p, 0) + 1
                    n = hits[p]
                if n < 3:
                    self._send(503, b"try later")
                else:
                    self._send(200, b"recovered:" + p.encode())
            elif p == "/auth":
                self._send(302, b"", [("Location", "/login")])
            elif p == "/login":
                self._send(200, b"<html>sign in</html>")
            elif p.startswith("/page/"):
                _, _, key, i = p.split("/")
                i = int(i)
                nxt = (f"http://{self.server.server_address[0]}:"
                       f"{self.server.server_address[1]}/page/{key}/{i + 1}"
                       if i < 2 else None)
                self._send(200, json.dumps(
                    {"item": f"{key}-{i}", "next": nxt}).encode())
            else:
                self._send(404, b"nope")

        def log_message(self, *a):   # keep pytest output clean
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        srv.server_close()


def test_fetch_binary_over_real_sockets(spark, loopback_server):
    """S12 end-to-end without any injected fake: retries ride through
    real 503s, ignored statuses surface as error rows, content lands."""
    base = loopback_server
    urls = [(1, f"{base}/ok/alpha"), (2, f"{base}/flaky/one"),
            (3, f"{base}/missing")]
    df = spark.createDataFrame(urls, "id long, url string").coalesce(1)
    rows = {r.id: r for r in FX.fetch_binary(
        df, "url", FX.urllib_transport_factory(),
        id_cols=["id"], max_attempts=4,
        ignored_status=[404]).collect()}
    assert rows[1].status == 200
    assert bytes(rows[1].content) == b"payload:alpha"
    assert rows[1].n_attempts == 1
    assert rows[2].status == 200                   # recovered on retry
    assert bytes(rows[2].content).startswith(b"recovered:")
    assert rows[2].n_attempts == 3                 # two 503s then 200
    assert rows[3].status == 404 and rows[3].content is None


def test_fetch_auth_redirect_over_real_sockets(spark, loopback_server):
    """The real redirect chain (302 → /login) must fail the job loudly,
    not store the login page."""
    df = spark.createDataFrame(
        [(1, f"{loopback_server}/auth")], "id long, url string")
    with pytest.raises(Exception, match="(?i)redirect|credentials"):
        FX.fetch_binary(df, "url", FX.urllib_transport_factory(),
                        id_cols=["id"],
                        auth_redirect_suffix="/login").collect()


def test_fetch_paged_over_real_sockets(spark, loopback_server):
    """S7-style cursor pagination against the live server: each page's
    payload carries the next URL; two keys page independently."""
    base = loopback_server
    keys = spark.createDataFrame(
        [("a", f"{base}/page/a/0"), ("b", f"{base}/page/b/0")],
        "key string, first_url string")

    def next_url(content: bytes):
        return json.loads(content.decode())["next"]

    pages = FX.fetch_paged(keys, "first_url",
                           FX.urllib_transport_factory(),
                           next_url).collect()
    got = {(r.key, r.page_index): json.loads(bytes(r.content).decode())
           for r in pages}
    assert len(got) == 6       # 3 pages per key
    assert got[("a", 0)]["item"] == "a-0"
    assert got[("b", 2)]["item"] == "b-2" and got[("b", 2)]["next"] is None
