"""WARC (Web ARChive, ISO 28500) record source — the container format
every CommonCrawl-style LLM corpus arrives in.

`parse_warc` is a real, stdlib-only WARC/1.0 parser: it walks a blob of
concatenated records, reads each record's header block (CRLF-separated
`Name: value` lines), extracts the body by `Content-Length`, and
consumes the record-terminating CRLF CRLF. Malformed blobs raise
ValueError (routed, like every decode kernel). `build_warc_record` is
the test/synthesis twin.

Scale shape: WARC blobs travel as an opaque binary column (the same
multimodal plumbing as images); parsing runs inside mapInPandas, so a
1000-executor cluster parses its own partitions' blobs — record
boundaries never cross a task, bytes never shuffle.
"""

from __future__ import annotations

__all__ = ["build_warc_record", "parse_warc"]

_CRLF = b"\r\n"


def build_warc_record(
    uri: str, body: bytes, warc_type: str = "response", record_id: str | None = None
) -> bytes:
    """One WARC/1.0 record with the mandatory header fields."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Target-URI: " + uri.encode(),
    ]
    if record_id:
        headers.append(b"WARC-Record-ID: <" + record_id.encode() + b">")
    headers.append(b"Content-Length: " + str(len(body)).encode())
    return _CRLF.join(headers) + _CRLF + _CRLF + body + _CRLF + _CRLF


def parse_warc(blob: bytes, permissive: bool = False) -> list[dict]:
    """Concatenated WARC records → list of {headers: dict, body: bytes}.

    Tolerates trailing padding CRLFs between records; raises ValueError
    on a truncated header block, a missing/invalid Content-Length, or a
    body shorter than declared — the caller routes the blob's row.
    With ``permissive=True`` the cleanly-parsed record prefix is
    returned instead of raising (the data source's permissive mode).
    """
    out: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record padding
        while blob.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        try:
            rec, pos = _parse_record(blob, pos, n)
        except ValueError:
            if permissive:
                return out
            raise
        out.append(rec)
    return out


def _parse_record(blob: bytes, pos: int, n: int) -> tuple[dict, int]:
    end = blob.find(_CRLF + _CRLF, pos)
    if end < 0:
        raise ValueError("truncated WARC header block")
    header_lines = blob[pos:end].split(_CRLF)
    if not header_lines or not header_lines[0].startswith(b"WARC/"):
        raise ValueError("missing WARC version line")
    headers = {}
    for line in header_lines[1:]:
        k, sep, v = line.partition(b": ")
        if not sep:
            raise ValueError(f"bad WARC header line: {line!r}")
        headers[k.decode()] = v.decode()
    try:
        clen = int(headers["Content-Length"])
    except (KeyError, ValueError) as e:
        raise ValueError("missing/invalid Content-Length") from e
    body_start = end + 4
    if body_start + clen > n:
        raise ValueError("WARC body shorter than Content-Length")
    return (
        {"headers": headers, "body": blob[body_start : body_start + clen]},
        body_start + clen,
    )
