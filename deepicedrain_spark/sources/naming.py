"""naming — filesystem-safe partition-key encoding for per-key sinks.

``write_hdf5_partitioned`` / ``write_zarr_partitioned`` interpolate
the partition-key VALUE into a granule/store name on executors. A raw
string key containing ``/``, ``\\`` or ``..`` would write outside the
output directory (or fail opaquely mid-job), and ``%`` would collide
with the escape itself — so every byte outside ``[A-Za-z0-9_-]`` is
percent-encoded (including ``.``, which makes ``..`` unrepresentable).
Integer keys — the common case (rgt, date bucket, hash mod N) — pass
through unchanged, so existing layouts keep their names (ADVICE r5,
hdf5.py:211).
"""

from __future__ import annotations

_SAFE = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_-")


def safe_key_component(key) -> str:
    """Deterministic, injective, filesystem-safe rendering of a
    partition-key value for use as a single path component."""
    out = []
    for ch in str(key):
        if ch in _SAFE:
            out.append(ch)
        else:
            out.extend(f"%{b:02X}" for b in ch.encode("utf-8"))
    return "".join(out)
