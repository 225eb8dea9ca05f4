"""Factor/matrix serialization (checkpoint-resume of factorizations).

Reference equivalents: umfpack_*_save_numeric / load_numeric /
save_symbolic / load_symbolic (versioned opaque blobs,
umfpack_save_numeric.c:33,61) and GxB_Matrix_serialize/deserialize with
block compression (GB_serialize.c).  We write versioned .npz archives
(zlib-compressed — the stdlib stand-in for the reference's LZ4/ZSTD,
documented deviation) keyed by a format tag, so factors round-trip across
sessions: the orbax-style "(perm, etree, supernode partition, factor
shards)" checkpoint from SURVEY.md §5.
"""
from __future__ import annotations

import io
import json
from typing import Any

import numpy as np

from ..core.sparse import SparseCSC
from ..core.status import SparseError, Status

_MAGIC = "suitesparse_tpu"
_VERSION = 1


def _pack(kind: str, meta: dict, arrays: dict, path) -> None:
    header = dict(magic=_MAGIC, version=_VERSION, kind=kind, meta=meta)
    np.savez_compressed(path, __header__=np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8), **arrays)


def _unpack(path, kind: str):
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(bytes(z["__header__"]).decode())
        if header.get("magic") != _MAGIC:
            raise SparseError(Status.INVALID, "not a suitesparse_tpu archive")
        if header.get("version") > _VERSION:
            raise SparseError(Status.INVALID,
                              f"archive version {header['version']} too new")
        if header.get("kind") != kind:
            raise SparseError(Status.INVALID,
                              f"archive holds {header['kind']!r}, wanted {kind!r}")
        arrays = {k: z[k] for k in z.files if k != "__header__"}
    return header["meta"], arrays


# -- matrices ----------------------------------------------------------------

def save_sparse(path, A: SparseCSC) -> None:
    """GxB_Matrix_serialize analog."""
    _pack("sparse", dict(shape=list(A.shape), stype=int(A.stype),
                         has_values=A.data is not None),
          dict(indptr=A.indptr, indices=A.indices,
               **({"data": A.data} if A.data is not None else {})), path)


def load_sparse(path) -> SparseCSC:
    meta, arr = _unpack(path, "sparse")
    return SparseCSC(arr["indptr"], arr["indices"], arr.get("data"),
                     tuple(meta["shape"]), stype=meta["stype"])


# -- simplicial factors ------------------------------------------------------

def save_factor(path, f) -> None:
    """Simplicial Factor save (umfpack_save_numeric spirit)."""
    arrays = dict(perm=f.perm, Lp=f.Lp, Li=f.Li, Lx=f.Lx)
    if f.D is not None:
        arrays["D"] = f.D
    _pack("factor", dict(n=f.n, is_ll=bool(f.is_ll), minor=int(f.minor)),
          arrays, path)


def load_factor(path):
    from ..cholesky.simplicial import Factor
    meta, arr = _unpack(path, "factor")
    return Factor(n=meta["n"], perm=arr["perm"], Lp=arr["Lp"], Li=arr["Li"],
                  Lx=arr["Lx"], D=arr.get("D"), is_ll=meta["is_ll"],
                  minor=meta["minor"])


# -- supernodal factors ------------------------------------------------------

def save_super_factor(path, f) -> None:
    """Checkpoint (perm, supernode partition, panel shards) — SURVEY.md §5."""
    ss = f.plan.ss
    _pack("super_factor",
          dict(n=ss.n, nsuper=ss.nsuper, minor=int(f.minor),
               dtype=np.dtype(f.dtype).name, total=int(ss.total)),
          dict(Lx=np.asarray(f.Lx), perm=f.perm, super=ss.super,
               col_to_super=ss.col_to_super, sn_rowptr=ss.sn_rowptr,
               sn_rows=ss.sn_rows,
               sn_parent=ss.sn_parent,
               level_sizes=np.array([len(l) for l in ss.levels]),
               levels_flat=np.concatenate(ss.levels) if ss.levels
               else np.empty(0, np.int64),
               a_dst=ss.a_scatter_dst, a_src=ss.a_scatter_src), path)


def load_super_factor(path):
    import jax.numpy as jnp
    from ..cholesky.supernodal import SuperSymbolic, _assign_layout
    from ..cholesky.super_numeric import SuperFactor, build_plan
    meta, arr = _unpack(path, "super_factor")
    sizes = arr["level_sizes"]
    flat = arr["levels_flat"]
    levels, k = [], 0
    for s in sizes:
        levels.append(flat[k:k + int(s)])
        k += int(s)
    nsuper = meta["nsuper"]
    shapes = [(int(arr["sn_rowptr"][s + 1] - arr["sn_rowptr"][s]),
               int(arr["super"][s + 1] - arr["super"][s]))
              for s in range(nsuper)]
    # layout assignment is deterministic given (levels, shapes)
    panel_off, panel_Np, panel_Mp, total, level_buckets, wave_w = \
        _assign_layout(levels, shapes)
    assert total == meta["total"], "layout mismatch on load"
    ss = SuperSymbolic(n=meta["n"], nsuper=nsuper, super=arr["super"],
                       col_to_super=arr["col_to_super"],
                       sn_rowptr=arr["sn_rowptr"], sn_rows=arr["sn_rows"],
                       panel_off=panel_off, panel_Np=panel_Np,
                       panel_Mp=panel_Mp, total=total,
                       sn_parent=arr["sn_parent"], levels=levels,
                       level_buckets=level_buckets,
                       lnz_dense=total, a_scatter_dst=arr["a_dst"],
                       a_scatter_src=arr["a_src"], wave_w=wave_w)
    plan = build_plan(ss)
    return SuperFactor(plan=plan, Lx=jnp.asarray(arr["Lx"]), perm=arr["perm"],
                       minor=meta["minor"], dtype=np.dtype(meta["dtype"]))


# -- KLU ---------------------------------------------------------------------

def save_klu(path, num) -> None:
    sym = num.sym
    blocks_meta = []
    arrays: dict[str, Any] = dict(p=sym.p, q=sym.q, r=sym.r, pnum=num.pnum,
                                  Rs=num.Rs, p_final=num.p_final)
    off = num.offdiag.tocoo()
    arrays.update(off_row=off.row.astype(np.int64),
                  off_col=off.col.astype(np.int64), off_val=off.data)
    for i, blk in enumerate(num.blocks):
        blocks_meta.append(blk.n)
        for name in ("Lp", "Li", "Lx", "Up", "Ui", "Ux", "pivot_rows"):
            arrays[f"b{i}_{name}"] = getattr(blk, name)
    _pack("klu", dict(n=sym.n, nblocks=sym.nblocks, nmatch=int(sym.nmatch),
                      ordering=sym.ordering, blocks=blocks_meta,
                      singular_col=int(num.singular_col),
                      flops=float(num.flops)), arrays, path)


def load_klu(path):
    import scipy.sparse as sp
    from ..lu.klu import KLUNumeric, KLUSymbolic, _BlockLU
    meta, arr = _unpack(path, "klu")
    sym = KLUSymbolic(n=meta["n"], p=arr["p"], q=arr["q"], r=arr["r"],
                      nblocks=meta["nblocks"], nmatch=meta["nmatch"],
                      ordering=meta["ordering"])
    blocks = []
    for i, nb in enumerate(meta["blocks"]):
        blocks.append(_BlockLU(n=nb, Lp=arr[f"b{i}_Lp"], Li=arr[f"b{i}_Li"],
                               Lx=arr[f"b{i}_Lx"], Up=arr[f"b{i}_Up"],
                               Ui=arr[f"b{i}_Ui"], Ux=arr[f"b{i}_Ux"],
                               pivot_rows=arr[f"b{i}_pivot_rows"]))
    n = meta["n"]
    off = sp.coo_matrix((arr["off_val"], (arr["off_row"], arr["off_col"])),
                        shape=(n, n)).tocsc()
    return KLUNumeric(sym=sym, blocks=blocks, pnum=arr["pnum"], Rs=arr["Rs"],
                      offdiag=off, singular_col=meta["singular_col"],
                      flops=meta["flops"], p_final=arr["p_final"])


# -- GxB_Matrix_serialize / deserialize analog -------------------------------
# (GB_serialize.c: blob = header + per-block compressed streams; the
# reference offers LZ4/LZ4HC/ZSTD — we offer zstd (preferred) and zlib.)

_BLOCK = 1 << 22          # 4 MiB uncompressed blocks, like GB_serialize


def _codec(method: str):
    """Returns (actual_method, compress, decompress)."""
    if method == "zstd":
        try:
            import zstandard as zstd
            c = zstd.ZstdCompressor()
            d = zstd.ZstdDecompressor()
            return "zstd", (lambda b: c.compress(b)), \
                (lambda b: d.decompress(b))
        except ImportError:
            method = "zlib"
    if method == "zlib":
        import zlib
        return "zlib", zlib.compress, zlib.decompress
    if method == "none":
        return "none", (lambda b: b), (lambda b: b)
    raise SparseError(Status.INVALID, f"unknown serialize method {method!r}")


def matrix_serialize(A: SparseCSC, method: str = "zstd") -> bytes:
    """GxB_Matrix_serialize: matrix -> compressed blob (one buffer)."""
    method, comp, _ = _codec(method)
    data = A.data if A.data is not None else np.empty(0)
    streams = []
    for arr in (np.asarray(A.indptr, dtype=np.int64),
                np.asarray(A.indices, dtype=np.int64), np.asarray(data)):
        raw = arr.tobytes()
        blocks = [comp(raw[i:i + _BLOCK]) for i in range(0, len(raw), _BLOCK)]
        if not blocks:
            blocks = [comp(b"")]
        streams.append(blocks)
    header = dict(magic=_MAGIC, version=_VERSION, kind="grb_matrix",
                  method=method,
                  shape=list(A.shape), stype=int(A.stype),
                  has_values=A.data is not None,
                  dtype=str(np.asarray(data).dtype),
                  nblocks=[len(s) for s in streams],
                  sizes=[[len(b) for b in s] for s in streams])
    hb = json.dumps(header).encode()
    out = [len(hb).to_bytes(8, "little"), hb]
    for s in streams:
        out.extend(s)
    return b"".join(out)


def matrix_deserialize(blob: bytes) -> SparseCSC:
    """GxB_Matrix_deserialize: blob -> matrix."""
    hlen = int.from_bytes(blob[:8], "little")
    header = json.loads(blob[8:8 + hlen].decode())
    if header.get("magic") != _MAGIC or header.get("kind") != "grb_matrix":
        raise SparseError(Status.INVALID, "not a serialized matrix blob")
    _, _, decomp = _codec(header["method"])
    pos = 8 + hlen
    arrays = []
    for sizes in header["sizes"]:
        raw = b""
        for sz in sizes:
            raw += decomp(blob[pos:pos + sz])
            pos += sz
        arrays.append(raw)
    indptr = np.frombuffer(arrays[0], dtype=np.int64)
    indices = np.frombuffer(arrays[1], dtype=np.int64)
    data = (np.frombuffer(arrays[2], dtype=np.dtype(header["dtype"]))
            if header["has_values"] else None)
    return SparseCSC(indptr.copy(), indices.copy(),
                     None if data is None else data.copy(),
                     tuple(header["shape"]), stype=header["stype"])
