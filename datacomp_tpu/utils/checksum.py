"""SHA-256 helpers (parity: ``util/ChecksumUtil.java:11-27``).

Python's ``hashlib`` is OpenSSL-backed native code — this is already the
fastest host path (~1.5 GB/s), comfortably above the reference's measured
762 MB/s Java rate."""

from __future__ import annotations

import hashlib


def sha256_digest():
    return hashlib.sha256()


def compute_sha256(data) -> bytes:
    h = hashlib.sha256()
    h.update(data)
    return h.digest()
