"""SuiteSparse Matrix Collection client (ssget equivalent).

Reference: ssget/README.txt — fetch matrices by id or group/name, cache
locally, expose the stats index.  This environment has no network egress,
so the client resolves, in order:
  1. a local cache directory (``SSTPU_COLLECTION`` env var or
     ``~/.sstpu_collection``) holding ``<group>/<name>.mtx[.gz]`` or ``.rb``;
  2. matrices bundled with the repo under ``matrices/``;
  3. synthetic stand-ins from :mod:`generators` for well-known names
     (grid Laplacians etc.), so benchmarks remain runnable offline.
When network is available, ``fetch=True`` downloads from sparse.tamu.edu
exactly like ssget does.
"""
from __future__ import annotations

import os
import pathlib
import tarfile
import urllib.request

from ..core.sparse import SparseCSC
from . import generators
from .matrixmarket import mmread
from .rbio import rbread

_BASE_URL = "https://sparse.tamu.edu"


def cache_dir() -> pathlib.Path:
    d = pathlib.Path(os.environ.get("SSTPU_COLLECTION",
                                    os.path.expanduser("~/.sstpu_collection")))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _repo_matrices_dir() -> pathlib.Path:
    return pathlib.Path(__file__).resolve().parents[2] / "matrices"


def get(name: str, fetch: bool = False) -> SparseCSC:
    """ssget(name): return the matrix as SparseCSC.

    ``name`` is ``group/name`` or bare ``name``; falls back to synthetic
    generators for known benchmark families when offline.
    """
    bare = name.split("/")[-1]
    for root in (cache_dir(), _repo_matrices_dir()):
        for ext in (".mtx", ".mtx.gz", ".rb", ".rua", ".rsa"):
            for cand in (root / (name + ext), root / (bare + ext)):
                if cand.exists():
                    if ext.startswith(".mtx"):
                        return mmread(str(cand))
                    return rbread(str(cand))
    if fetch:
        return _download(name)
    gen = generators.synthetic_standin(bare)
    if gen is not None:
        return gen
    raise FileNotFoundError(
        f"matrix {name!r} not in cache, not bundled, no synthetic stand-in; "
        f"re-run with fetch=True on a networked machine")


def _download(name: str) -> SparseCSC:
    if "/" not in name:
        raise ValueError("fetch requires 'group/name'")
    group, bare = name.split("/")
    url = f"{_BASE_URL}/MM/{group}/{bare}.tar.gz"
    dest = cache_dir() / group
    dest.mkdir(parents=True, exist_ok=True)
    tar_path = dest / f"{bare}.tar.gz"
    urllib.request.urlretrieve(url, tar_path)
    with tarfile.open(tar_path) as tf:
        tf.extractall(dest)
    return mmread(str(dest / bare / f"{bare}.mtx"))


# -- stats index (ssget ssstats.csv equivalent) ------------------------------

def stats(name: str, fetch: bool = False) -> dict:
    """Per-matrix stats record (ssget sskinds/ssstats analog): computed
    locally from the matrix (group, name, nrow, ncol, nnz, symmetry,
    posdef-ish, kind guess)."""
    A = get(name, fetch=fetch)
    from ..core.sparse import symmetry as _symmetry
    sym, nzdiag = _symmetry(A) if A.stype == 0 else (1.0, min(A.shape))
    rec = {
        "name": name,
        "nrow": A.nrow,
        "ncol": A.ncol,
        "nnz": A.nnz,
        "stype": A.stype,
        "pattern_symmetry": sym,
        "nzdiag": nzdiag,
        "is_square": A.nrow == A.ncol,
    }
    if A.data is not None and A.nrow == A.ncol and sym == 1.0:
        d = A.diagonal()
        rec["posdef_candidate"] = bool((d > 0).all())
    return rec


def index(names=None) -> list:
    """Stats index over the locally available matrices (bundled + standins)."""
    from .generators import _STANDINS
    names = names or sorted(_STANDINS)
    return [stats(n) for n in names]
