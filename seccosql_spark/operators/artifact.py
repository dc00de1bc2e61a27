"""Build-once / probe-many disk artifacts (persisted ANN index, partitioned
or bucketed table layouts): one shared cache-key + marker discipline.

The cache key mixes the DATA identity (source file path), the build
PARAMETERS, and the SOURCE TEXT of the build code itself — so an edit to
the builder (a kmeans fix, a changed partition column) automatically lands
in a fresh directory instead of silently serving a stale artifact while
the oracle replays the new semantics (r11 review finding: a hard-coded
"v1" tag only invalidates when a human remembers to bump it, and the
resulting red driver row looks like an engine regression until someone
clears /tmp)."""

from __future__ import annotations

import hashlib
import inspect
import os
import tempfile
from typing import Callable, Iterable


def artifact_key(key_parts: Iterable[object], code: Iterable = ()) -> str:
    """Hex digest over data/parameter identity plus the builders' source.
    ``code`` accepts functions OR whole modules — passing the module is
    the conservative default (any edit to it invalidates)."""
    h = hashlib.md5()
    for p in key_parts:
        h.update(str(p).encode())
        h.update(b"|")
    for obj in code:
        h.update(inspect.getsource(inspect.unwrap(obj)).encode())
    return h.hexdigest()[:16]


def build_once(
    prefix: str,
    key_parts: Iterable[object],
    build: Callable[[str], None],
    code: Iterable[Callable] = (),
) -> str:
    """Return the artifact directory for (key_parts, code), building it via
    ``build(dir)`` exactly once per key. The _BUILT marker is written only
    after ``build`` returns, so a crashed build is retried, never served."""
    d = os.path.join(
        tempfile.gettempdir(), f"{prefix}_{artifact_key(key_parts, code)}"
    )
    marker = os.path.join(d, "_BUILT")
    if not os.path.exists(marker):
        build(d)
        os.makedirs(d, exist_ok=True)
        with open(marker, "w") as f:
            f.write("ok")
    return d
