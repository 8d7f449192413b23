"""Storage-URL parsing (SURVEY.md §2.1 S5).

The reference parses ``s3://bucket/key`` plus https virtual-host and
path styles into ``{bucket, key}`` (``services/s3_download_service.py:
388-428``). Parquet-path inputs make this mostly moot here, but the
util exists so path-style object listings can be mapped to
``read_parquet``-able locations. Pure function, no boto/network.
"""

from __future__ import annotations

import re
import urllib.parse

_VHOST_RE = re.compile(r"^([^.]+)\.s3[.-][^/]*amazonaws\.com$")
_S3_HOST_RE = re.compile(r"^s3[.-][^/]*amazonaws\.com$")


def parse_storage_url(url: str) -> dict | None:
    """``s3://b/k`` | ``https://b.s3.<region>.amazonaws.com/k`` |
    ``https://s3.<region>.amazonaws.com/b/k`` → {scheme, bucket, key};
    None when the url is not an object-storage url."""
    p = urllib.parse.urlsplit(url)
    if p.scheme == "s3":
        return {"scheme": "s3", "bucket": p.netloc,
                "key": p.path.lstrip("/")}
    if p.scheme in ("http", "https"):
        host = p.netloc.lower()
        m = _VHOST_RE.match(host)
        if m:  # virtual-host style
            return {"scheme": "s3", "bucket": m.group(1),
                    "key": p.path.lstrip("/")}
        if _S3_HOST_RE.match(host):  # path style
            parts = p.path.lstrip("/").split("/", 1)
            if len(parts) == 2:
                return {"scheme": "s3", "bucket": parts[0], "key": parts[1]}
    return None
