"""Pure-stdlib WARC codec (ISO 28500) for the web-crawl source path.

WARC is the container CommonCrawl and every mainstream crawler ship —
a crawl-scale pipeline's raw input is WARC files, not loose HTML.  The
format is simple enough for a dependency-free reader: records are
``WARC/1.0`` + CRLF header lines + a ``Content-Length``-delimited
payload + a CRLF CRLF trailer, concatenated; archives are commonly
stored as per-record gzip MEMBERS concatenated into one ``.warc.gz``
(the stdlib ``gzip`` module reads multi-member streams transparently).
``response`` records carry an HTTP response as payload: status line +
headers + CRLF CRLF + body.

Writer + reader both live here so the Spark tests can synthesize real
archives and parse them back without any fixture files.  Public spec:
ISO 28500 / the WARC 1.1 format specification.  No reference-repo
counterpart — the reference has no web surface at all.
"""

from __future__ import annotations

import gzip as _gzip
import io

CRLF = b"\r\n"


def build_record(warc_type: str, headers: dict, payload: bytes) -> bytes:
    """One WARC record: version line, headers (Content-Length computed
    here), blank line, payload, record trailer."""
    head = [b"WARC/1.0"]
    head.append(f"WARC-Type: {warc_type}".encode("ascii"))
    for k, v in headers.items():
        head.append(f"{k}: {v}".encode("ascii"))
    head.append(b"Content-Length: " + str(len(payload)).encode("ascii"))
    return CRLF.join(head) + CRLF + CRLF + payload + CRLF + CRLF


def build_http_response(body: bytes, status: int = 200,
                        content_type: str = "text/html") -> bytes:
    """HTTP/1.1 response payload for a ``response`` record."""
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently",
              500: "Internal Server Error"}.get(status, "OK")
    head = (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("ascii")
    return head + body


def build_warc(records: list, per_record_gzip: bool = False) -> bytes:
    """Concatenate ``(warc_type, headers, payload)`` triples into one
    archive; ``per_record_gzip`` emits the CommonCrawl layout (one gzip
    member per record)."""
    out = io.BytesIO()
    for warc_type, headers, payload in records:
        rec = build_record(warc_type, headers, payload)
        if per_record_gzip:
            # mtime pinned: archives must be byte-deterministic
            buf = io.BytesIO()
            with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            rec = buf.getvalue()
        out.write(rec)
    return out.getvalue()


def _split_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(CRLF):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace")] = (
                v.strip().decode("ascii", "replace"))
    return headers


def parse_warc(data: bytes) -> list:
    """All records of a plain or gzipped archive, in order:
    ``[(headers dict incl. 'WARC-Type', payload bytes), ...]``.
    Leniently skips leading noise between records (some writers pad);
    raises ``ValueError`` on a structurally broken record (missing
    Content-Length or truncated payload) — callers quarantine."""
    if data[:2] == b"\x1f\x8b":  # gzip magic; multi-member reads fine
        data = _gzip.decompress(data)
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = data.find(CRLF + CRLF, start)
        if head_end < 0:
            raise ValueError("WARC record header never terminates")
        headers = _split_headers(data[start + len(b"WARC/1.0") + 2:
                                      head_end])
        try:
            clen = int(headers["Content-Length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing Content-Length")
        body_start = head_end + 4
        if body_start + clen > n:
            raise ValueError("WARC payload truncated")
        out.append((headers, data[body_start:body_start + clen]))
        pos = body_start + clen
    return out


def parse_http_response(payload: bytes):
    """``(status int, headers dict, body bytes)`` from a ``response``
    record payload; raises ``ValueError`` if it is not HTTP."""
    sep = payload.find(CRLF + CRLF)
    if sep < 0 or not payload.startswith(b"HTTP/"):
        raise ValueError("payload is not an HTTP response")
    head = payload[:sep].split(CRLF)
    parts = head[0].split(b" ", 2)
    if len(parts) < 2:
        raise ValueError("malformed HTTP status line")
    status = int(parts[1])
    headers = _split_headers(CRLF.join(head[1:]))
    return status, headers, payload[sep + 4:]
