"""Process-scoped scratch directories.

Several queries materialize fixtures or sinks on local disk (streaming
replay sources, format round-trips, signature stores). Each call used a
bare ``tempfile.mkdtemp``, which leaks one directory per invocation —
harmless once, but a full-registry parity or latency sweep runs every
query, so repeated sweeps accumulated hundreds of ``/tmp/kss_*`` dirs
(round-5 ADVICE flagged the q185 instance; round 6 generalizes the fix).

``scratch_dir`` hands out a mkdtemp like before but registers it for
removal at interpreter exit — safe for DataFrames that lazily read from
the directory, because the driver has collected everything by then.
Queries that can clean up eagerly (q185/q186) still do; this is the
backstop for the ones whose results stay lazy.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp + register for atexit removal."""
    d = tempfile.mkdtemp(prefix=prefix)
    _DIRS.append(d)
    return d


@atexit.register
def _cleanup() -> None:  # pragma: no cover — exercised at interpreter exit
    for d in _DIRS:
        shutil.rmtree(d, ignore_errors=True)
