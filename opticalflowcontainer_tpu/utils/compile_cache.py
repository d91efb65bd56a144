"""Persistent-compile-cache artifact: survive sandbox restarts.

The axon tunnel's remote compiles cost 20-300 s each (BENCH_r03 recorded
compile+first = 310 s; one cold 720p full-pipeline compile measured 1519 s),
and ``/root/.jax_cache`` does NOT survive sandbox restarts — only the git
repo does.  The reference pays its own startup cost once per process with
pre-allocated fixed-size buffers (reference neuflow_node.py:50-51, 94-99);
the TPU equivalent of "pay startup once" is shipping the XLA executable
cache entries for the bench programs as a repo artifact.

Mechanism (bench.py calls both):

- :func:`restore` — before the first compile, extract the artifact tarball
  into the (empty) cache dir.  Entries are keyed by a hash of (program,
  compile options, jax/XLA version), so a stale entry is a silent miss,
  never a wrong hit.
- :func:`export` — after a run, merge entries COMPILED DURING THE RUN
  (mtime >= run start) into the tarball.  A fully warm run compiles
  nothing and leaves the artifact unchanged; a code change recompiles just
  the changed programs and the merge keeps the rest.  A size cap drops the
  oldest entries so superseded programs age out.
"""
from __future__ import annotations

import os
import tarfile
import tempfile
import time

DEFAULT_CACHE_DIR = "/root/.jax_cache"
# per-entry + total caps: the headline bench programs are ~10-25 MB each;
# one 100 MB+ entry would be an accidental monster, not a bench program
MAX_ENTRY_BYTES = 100 * 1024 * 1024
MAX_TOTAL_BYTES = 384 * 1024 * 1024


def restore(tar_path: str, cache_dir: str = DEFAULT_CACHE_DIR) -> int:
    """Extract the artifact into ``cache_dir`` (existing entries win — they
    are newer).  Returns the number of entries restored; 0 if no artifact."""
    if not os.path.isfile(tar_path):
        return 0
    os.makedirs(cache_dir, exist_ok=True)
    n = 0
    try:
        with tarfile.open(tar_path, "r:gz") as tf:
            for m in tf.getmembers():
                # flat entries only — refuse paths (defense in depth; we
                # wrote this tarball, but a corrupt one must not escape)
                name = os.path.basename(m.name)
                if not m.isfile() or not name or name != m.name:
                    continue
                dest = os.path.join(cache_dir, name)
                if os.path.exists(dest):
                    n += 1  # already live (and newer): count as restored
                    continue
                src = tf.extractfile(m)
                if src is None:
                    continue
                with open(dest, "wb") as out:
                    out.write(src.read())
                n += 1
    except (OSError, tarfile.TarError):
        return 0
    return n


def export(tar_path: str, cache_dir: str = DEFAULT_CACHE_DIR,
           since: float = 0.0) -> int:
    """Merge cache entries with mtime >= ``since`` into the artifact,
    keeping existing tarball entries not superseded, newest-first under
    MAX_TOTAL_BYTES.  Returns the number of entries in the new artifact
    (0 = nothing to do, artifact untouched)."""
    fresh = {}
    try:
        for name in os.listdir(cache_dir):
            p = os.path.join(cache_dir, name)
            st = os.stat(p)
            if st.st_mtime >= since and st.st_size <= MAX_ENTRY_BYTES:
                fresh[name] = (st.st_mtime, p)
    except OSError:
        return 0
    if not fresh:
        return 0  # fully warm run: keep the existing artifact as-is

    # pull the old artifact's entries (name -> bytes) to merge
    old: dict[str, tuple[float, bytes]] = {}
    if os.path.isfile(tar_path):
        try:
            with tarfile.open(tar_path, "r:gz") as tf:
                for m in tf.getmembers():
                    name = os.path.basename(m.name)
                    if not m.isfile() or name != m.name or name in fresh:
                        continue
                    src = tf.extractfile(m)
                    if src is not None:
                        old[name] = (m.mtime, src.read())
        except (OSError, tarfile.TarError):
            old = {}

    # newest first, capped
    items: list[tuple[float, str, str | bytes]] = (
        [(mt, name, p) for name, (mt, p) in fresh.items()]
        + [(mt, name, data) for name, (mt, data) in old.items()])
    items.sort(key=lambda t: -t[0])
    total = 0
    kept = []
    for mt, name, payload in items:
        size = (os.path.getsize(payload) if isinstance(payload, str)
                else len(payload))
        if total + size > MAX_TOTAL_BYTES:
            continue
        total += size
        kept.append((mt, name, payload))

    os.makedirs(os.path.dirname(tar_path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(tar_path) or ".",
                               suffix=".tar.gz.tmp")
    os.close(fd)
    try:
        with tarfile.open(tmp, "w:gz", compresslevel=6) as tf:
            for mt, name, payload in kept:
                if isinstance(payload, str):
                    tf.add(payload, arcname=name)
                else:
                    info = tarfile.TarInfo(name)
                    info.size = len(payload)
                    info.mtime = int(mt)
                    import io

                    tf.addfile(info, io.BytesIO(payload))
        os.replace(tmp, tar_path)
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return 0
    return len(kept)


def run_start_marker() -> float:
    """Timestamp to pass as ``since`` (taken before the first compile)."""
    return time.time()
