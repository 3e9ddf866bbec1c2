"""Distributed fetch layer with injected transport (S7 / S12).

The reference fetches media and admin pages driver-side, one URL at a
time (src/gomus/_utils/fetch_htmls.py:63-217 with a polite 0.2 s sleep,
session-cookie auth and a sign-in-redirect check;
src/facebook.py:480-510's try-request-multiple-times retry;
src/instagram.py:185-210's ``paging.next`` cursor walk;
src/instagram.py:229-360's thumbnail download into files).  Spark-first,
the same behaviors become distributed operators:

- ``fetch_binary`` — URL table → blob column via Arrow ``mapInPandas``:
  one transport (≈ one HTTP session) per partition, bounded retries with
  a final raising attempt, per-request polite delay, ignored status
  codes surfacing as error rows, and an auth-redirect check that fails
  the job rather than silently storing login pages.
- ``fetch_paged`` — per-key cursor pagination inside ``applyInPandas``:
  pages for one key are inherently sequential (each response carries the
  next cursor), but thousands of keys (accounts, endpoints) page in
  parallel — the reference's per-account loop, distributed across keys.

The TRANSPORT is an injected callable ``url -> FetchResponse`` built per
partition by a ``transport_factory``.  This runtime has no network (and
no ``requests``), so production wires a real HTTP session factory in one
line; tests inject deterministic fakes — retry/auth/pagination logic is
fully exercised offline, and fetched bytes flow straight into the
multimodal codecs (a fetched BMP thumbnail decodes end-to-end in
tests/test_fetch.py).

Scale: fetch is latency-bound, so parallelism = partitions; repartition
the URL table to (cluster-wide request budget / per-partition rate).
Content lands as a binary column — downstream sizing goes through
``multimodal.media.blob_repartition``.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator, Sequence
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, IntegerType, StringType,
                               StructField, StructType)


@dataclass
class FetchResponse:
    """Minimal transport-agnostic response."""

    status: int
    content: bytes
    final_url: str = ""


Transport = Callable[[str], FetchResponse]
TransportFactory = Callable[[], Transport]


class AuthError(ConnectionError):
    """The endpoint redirected to a sign-in page — credentials are bad;
    failing loudly beats storing login HTML as data
    (fetch_htmls.py:101-104)."""


def _fetch_one(transport: Transport, url: str, max_attempts: int,
               polite_delay_s: float, ignored_status: Sequence[int],
               auth_redirect_suffix: str | None) -> tuple[int, bytes | None,
                                                          int]:
    """(status, content|None, attempts).  Retries transport exceptions up
    to ``max_attempts - 1`` times silently, then lets the final attempt
    raise (the reference's try-3-then-raise shape)."""
    last_exc: Exception | None = None
    for attempt in range(1, max_attempts + 1):
        if polite_delay_s:
            time.sleep(polite_delay_s)
        try:
            resp = transport(url)
        except Exception as exc:  # transport-level failure → retry
            last_exc = exc
            continue
        if auth_redirect_suffix and resp.final_url.endswith(
                auth_redirect_suffix):
            raise AuthError(
                f"fetch of {url!r} redirected to {resp.final_url!r} — "
                "check credentials")
        if resp.status >= 400:
            if resp.status in ignored_status:
                return resp.status, None, attempt
            last_exc = IOError(f"HTTP {resp.status} for {url!r}")
            continue
        return resp.status, bytes(resp.content), attempt
    raise last_exc if last_exc is not None else IOError(
        f"fetch of {url!r} failed with no attempts")


def fetch_binary(df: DataFrame, url_col: str,
                 transport_factory: TransportFactory,
                 id_cols: Sequence[str] = (),
                 max_attempts: int = 4,
                 polite_delay_s: float = 0.0,
                 ignored_status: Sequence[int] = (),
                 auth_redirect_suffix: str | None = None) -> DataFrame:
    """Fetch every row's URL into a binary column.

    Returns ``id_cols + (url, status, content, n_attempts)``; rows whose
    status is in ``ignored_status`` come back with NULL content (the
    reference's FailableTarget error outputs).  One transport per
    partition — connection/session reuse across that partition's URLs.
    """
    ids = list(id_cols)
    fields = [df.schema[c] for c in ids]
    schema = StructType(fields + [
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("content", BinaryType()),
        StructField("n_attempts", IntegerType()),
    ])
    ignored = tuple(ignored_status)

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                url = getattr(row, url_col)
                status, content, attempts = _fetch_one(
                    transport, url, max_attempts, polite_delay_s,
                    ignored, auth_redirect_suffix)
                out.append(tuple(getattr(row, c) for c in ids)
                           + (url, status, content, attempts))
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return df.select(*ids, url_col).mapInPandas(_run, schema)


def fetch_paged(keys: DataFrame, first_url_col: str,
                transport_factory: TransportFactory,
                next_url: Callable[[bytes], str | None],
                key_col: str = "key",
                max_pages: int = 1000,
                polite_delay_s: float = 0.0) -> DataFrame:
    """Cursor pagination per key: fetch page, extract the next cursor
    from the payload, repeat until exhausted (instagram.py:185-210's
    ``while 'next' in paging`` loop).  Sequential per key — parallel
    across keys via ``applyInPandas``.

    Returns ``(key_col, page_index, url, content)``.  ``max_pages`` is a
    runaway-cursor backstop; hitting it raises rather than silently
    truncating the feed.
    """
    key_field = keys.schema[key_col]
    schema = StructType([
        key_field,
        StructField("page_index", IntegerType()),
        StructField("url", StringType()),
        StructField("content", BinaryType()),
    ])

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        transport = transport_factory()
        out = []
        for row in pdf.itertuples(index=False):
            url: str | None = getattr(row, first_url_col)
            key = getattr(row, key_col)
            page = 0
            while url is not None:
                if page >= max_pages:
                    raise RuntimeError(
                        f"pagination for key {key!r} exceeded {max_pages} "
                        "pages — runaway cursor?")
                if polite_delay_s:
                    time.sleep(polite_delay_s)
                resp = transport(url)
                if resp.status >= 400:
                    raise IOError(f"HTTP {resp.status} for {url!r}")
                content = bytes(resp.content)
                out.append((key, page, url, content))
                url = next_url(content)
                page += 1
        return pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return keys.groupBy(key_col).applyInPandas(_run, schema)


def fetch_thumbnails(posts: DataFrame, transport_factory: TransportFactory,
                     url_col: str = "thumbnail_url",
                     id_col: str = "media_id",
                     **fetch_kwargs) -> DataFrame:
    """S7: Instagram post-thumbnail download as a blob column
    (src/instagram.py:229-360 writes files; here the bytes land next to
    the post row and flow into ``multimodal.media.decode_media``).
    Unsupported media types (the reference skips reels/IGTV) are the
    caller's filter — this operator fetches what it is given."""
    return fetch_binary(posts, url_col, transport_factory,
                        id_cols=[id_col], **fetch_kwargs)


def urllib_transport_factory(headers: dict | None = None,
                             timeout: float = 60.0) -> TransportFactory:
    """Stdlib transport: ``urllib.request`` with redirect-following and
    an opener per partition — no third-party dependency, so the fetch
    layer runs against real sockets even in runtimes without
    ``requests`` (exercised end-to-end against a loopback HTTP server in
    tests/test_fetch.py).  HTTP error statuses come back as normal
    ``FetchResponse``s (status, body), matching the requests-based
    transport's no-raise contract; transport-level failures (refused
    connection, timeout) raise and hit ``fetch_binary``'s retry path.
    """

    def factory() -> Transport:
        import urllib.error
        import urllib.request

        opener = urllib.request.build_opener()   # follows redirects
        if headers:
            opener.addheaders = list(headers.items())

        def transport(url: str) -> FetchResponse:
            try:
                with opener.open(url, timeout=timeout) as resp:
                    return FetchResponse(status=resp.status,
                                         content=resp.read(),
                                         final_url=resp.geturl())
            except urllib.error.HTTPError as err:   # 4xx/5xx: a response
                return FetchResponse(status=err.code, content=err.read(),
                                     final_url=err.geturl() or url)

        return transport

    return factory


def http_transport_factory(headers: dict | None = None,
                           cookies: dict | None = None,
                           timeout: float = 60.0) -> TransportFactory:
    """Production transport: one ``requests.Session`` per partition with
    shared headers/cookies (the reference's bearer-token and
    session-cookie patterns, facebook.py:487-492 / fetch_htmls.py:92-95).

    Import-guarded: this runtime has no network stack; calling the
    returned factory without ``requests`` installed raises with a clear
    message, and everything above it stays testable with fakes.
    """

    def factory() -> Transport:
        try:
            import requests
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                "http_transport_factory needs the 'requests' package; "
                "in environments without it, inject a custom transport"
            ) from exc
        session = requests.Session()
        if headers:
            session.headers.update(headers)
        if cookies:
            session.cookies.update(cookies)

        def transport(url: str) -> FetchResponse:
            resp = session.get(url, timeout=timeout)
            return FetchResponse(status=resp.status_code,
                                 content=resp.content,
                                 final_url=resp.url)

        return transport

    return factory
