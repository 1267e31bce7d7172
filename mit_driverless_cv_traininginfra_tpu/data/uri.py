"""Remote-URI ingestion seam.

The reference's cfg carries dataset/weights URIs that may be ``gs://``
blobs (``model_cfg/yolo_baseline.cfg:8-13`` train_uri/weights_uri; the
tutorials gsutil-fetch them). This environment has zero egress, so remote
URIs resolve through a **local mirror directory** instead:

    gs://bucket/path/file.csv  →  <mirror>/bucket/path/file.csv
    https://host/path/file     →  <mirror>/host/path/file

The mirror root comes from the ``MDCV_DATA_MIRROR`` env var (or an explicit
argument); populate it out-of-band (gsutil rsync on a connected machine).
Local paths pass through untouched, so every CLI keeps accepting both
forms — the reference's CLI contract is preserved without network access.
"""

from __future__ import annotations

import os
from typing import Optional

_SCHEMES = ("gs://", "https://", "http://", "s3://")

MIRROR_ENV = "MDCV_DATA_MIRROR"


def is_remote(uri: str) -> bool:
    return any(uri.startswith(s) for s in _SCHEMES)


def resolve_uri(uri: Optional[str], mirror: Optional[str] = None,
                must_exist: bool = True) -> Optional[str]:
    """Map a possibly-remote URI to a local path (see module docstring)."""
    if not uri or not is_remote(uri):
        return uri
    mirror = mirror or os.environ.get(MIRROR_ENV)
    if not mirror:
        raise FileNotFoundError(
            f"remote URI {uri!r} needs a local mirror: set ${MIRROR_ENV} "
            "to a directory mirroring the bucket layout (no egress here)")
    rel = uri.split("://", 1)[1]
    local = os.path.join(mirror, rel)
    if must_exist and not os.path.exists(local):
        raise FileNotFoundError(
            f"remote URI {uri!r} not found in mirror: expected {local}")
    return local
