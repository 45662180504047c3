"""Versioned serving pointers for index layouts — the missing half of
the write-new-then-swap contract.

Every maintenance path in this package (IVF compaction `ivf.py`,
inverted-index compaction `inverted.py::compact_inverted_index`, segment
merge `inverted.py::merge_inverted_indexes`) writes a NEW layout and
"lets the caller swap the serving pointer". This module is that pointer:
a tiny append-only JSON manifest mapping a logical index name to the
physical layout path currently served, with full version history.

Semantics (the Iceberg/Delta snapshot idea, reduced to what a layout
pointer needs):

* ``publish(root, name, path)`` — append a new version entry and
  repoint ``current`` via write-temp-then-rename (atomic on POSIX and
  HDFS; on object stores the same role is played by a conditional PUT —
  see fsio.atomic_write_text for the exact per-store contract). Readers
  never observe a half-written manifest.
* ``current(root, name)`` — the serving path. A reader resolves once
  per query; an in-flight query keeps reading the layout path it
  resolved, so compaction/merge can publish underneath it with zero
  coordination — old layout directories are immutable by the package's
  never-rewrite-in-place policy.
* ``version(root, name, v)`` — time travel: resolve any historical
  version for audits/rollback ("what did search serve yesterday").
* ``rollback(root, name, v)`` — publish an OLD path as a new version
  (history is append-only; rollback is a new pointer, not an erase).

All manifest IO goes through fsio (the Hadoop FileSystem layer), so the
manifest root can live on the same store as the layouts it points to —
s3/hdfs/file URIs or plain local paths alike.

Caveat on historical reads: layout DIRECTORIES are immutable under the
never-rewrite-in-place policy, but deletion vectors append tombstone
state INSIDE a layout — so resolving an old version replays deletes
issued against that layout since. For strict snapshot semantics,
compact (folding tombstones into a fresh directory) and publish the
compacted path; the pre-delete version then stays bit-frozen.

Single-writer per name, like every maintenance path here; concurrent
publishers need the conditional-PUT variant of the rename. Garbage
collection of unreferenced layout directories is a separate offline
sweep (list manifest → delete paths not in the retained suffix) — never
done inline, so readers of any retained version stay safe.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from .. import fsio


@dataclass(frozen=True)
class ManifestEntry:
    version: int
    path: str


def _manifest_file(root: str, name: str) -> str:
    return f"{root}/{name}.manifest.json"


def _load(root: str, name: str) -> list[ManifestEntry]:
    f = _manifest_file(root, name)
    if not fsio.exists(f):
        return []
    data = json.loads(fsio.read_text(f))
    return [ManifestEntry(int(e["version"]), e["path"]) for e in data["versions"]]


def publish(root: str, name: str, path: str) -> int:
    """Append ``path`` as the next version of ``name`` and atomically
    repoint ``current``. Returns the new version number."""
    entries = _load(root, name)
    v = entries[-1].version + 1 if entries else 1
    entries.append(ManifestEntry(v, path))
    payload = {
        "name": name,
        "current": v,
        "versions": [{"version": e.version, "path": e.path} for e in entries],
    }
    fsio.atomic_write_text(_manifest_file(root, name), json.dumps(payload))
    return v


def current(root: str, name: str) -> str:
    """The currently served layout path for ``name``."""
    entries = _load(root, name)
    if not entries:
        raise FileNotFoundError(f"no manifest for index {name!r} under {root}")
    return entries[-1].path


def version(root: str, name: str, v: int) -> str:
    """Time travel: the layout path served at version ``v``."""
    for e in _load(root, name):
        if e.version == v:
            return e.path
    raise KeyError(f"index {name!r} has no version {v}")


def history(root: str, name: str) -> list[ManifestEntry]:
    """Full append-only version history (oldest first)."""
    return _load(root, name)


def rollback(root: str, name: str, v: int) -> int:
    """Re-publish historical version ``v``'s path as a NEW version —
    history is never rewritten."""
    return publish(root, name, version(root, name, v))
