"""Row partitioning onto WHELL compute slabs (the TPU-fast local SpMV).

Same partition + halo plan as :mod:`spgpu_tpu.parallel.partition`, but
each shard's interior and exterior nonzeros are laid out as WHELL
(:mod:`spgpu_tpu.formats.whell`) so the shard-local products run the
Pallas kernel instead of the XLA gather path.  Shards are stacked into
rectangular leaves (padded to the maximum tile count) so the whole
structure shards along axis 0 of every leaf under ``shard_map``.
"""

from __future__ import annotations

import dataclasses
import jax
import numpy as np

from spgpu_tpu.core import CHUNK_TILES as _CT
from spgpu_tpu.core import round_up
from spgpu_tpu.formats import CooMatrix, WhellMatrix
from spgpu_tpu.convert.whell import coo_to_whell

__all__ = ["PartitionedWhell", "partition_coo_rows_whell"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PartitionedWhell:
    """Row-partitioned square matrix; WHELL interior/exterior slabs."""

    # interior slab leaves (leading shard axis S)
    int_values: jax.Array
    int_residue: jax.Array
    int_page_tab: jax.Array
    int_tile_base: jax.Array
    int_chunk_group: jax.Array
    # exterior slab leaves (columns index the halo buffer)
    ext_values: jax.Array
    ext_residue: jax.Array
    ext_page_tab: jax.Array
    ext_tile_base: jax.Array
    ext_chunk_group: jax.Array
    # halo plan
    send_idx: jax.Array  # (S, S, K)
    # static metadata
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    chunk: int = dataclasses.field(metadata=dict(static=True))
    halo_width: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    int_meta: tuple = dataclasses.field(metadata=dict(static=True))
    ext_meta: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def padded_rows(self) -> int:
        return self.n_shards * self.chunk

    @property
    def storage_bytes(self) -> int:
        tot = 0
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if hasattr(v, "size") and hasattr(v, "dtype"):
                tot += int(v.size) * np.dtype(v.dtype).itemsize
        return tot

    def local_interior(self, leaves) -> WhellMatrix:
        num_hacks, num_groups, total_slots, x_pages = self.int_meta
        v, r, p, tb, cg = leaves
        return WhellMatrix(
            values=v, residue=r, page_tab=p, tile_base=tb,
            chunk_group=cg, row_perm=None,
            n_rows=self.chunk, n_cols=self.chunk, num_hacks=num_hacks,
            num_groups=num_groups, total_slots=total_slots, nnz=0,
            x_pages=x_pages,
        )

    def local_exterior(self, leaves) -> WhellMatrix:
        num_hacks, num_groups, total_slots, x_pages = self.ext_meta
        v, r, p, tb, cg = leaves
        return WhellMatrix(
            values=v, residue=r, page_tab=p, tile_base=tb,
            chunk_group=cg, row_perm=None,
            n_rows=self.chunk, n_cols=self.n_shards * self.halo_width,
            num_hacks=num_hacks, num_groups=num_groups,
            total_slots=total_slots, nnz=0, x_pages=x_pages,
        )


def _pad_stack_whell(mats):
    """Stack per-shard WhellMatrix leaves, padding tiles to the max."""
    import jax.numpy as jnp

    # shared metadata comes from mats[0]: every shard MUST agree on the
    # layout geometry or the stacked leaves silently mix conventions
    m0 = mats[0]
    for i, m in enumerate(mats[1:], 1):
        same = (m.num_hacks == m0.num_hacks
                and m.num_groups == m0.num_groups
                and m.x_pages == m0.x_pages
                and m.group_hacks == m0.group_hacks
                and m.window_pages == m0.window_pages
                and m.chunk_tiles == m0.chunk_tiles
                and m.packed == m0.packed)
        if not same:
            raise ValueError(
                f"shard {i} layout metadata diverges from shard 0 "
                f"({(m.num_hacks, m.num_groups, m.x_pages, m.group_hacks, m.window_pages, m.chunk_tiles, m.packed)} vs "
                f"{(m0.num_hacks, m0.num_groups, m0.x_pages, m0.group_hacks, m0.window_pages, m0.chunk_tiles, m0.packed)}) "
                "— shards cannot stack into one sharded pytree")
    t_max = max(m.total_slots // 8 for m in mats)
    t_max = round_up(max(t_max, _CT), _CT)

    def pad_tiles(m, arr, per_tile: bool, lanes: int, fill=0):
        want = (t_max if per_tile else t_max * 8)
        a = np.asarray(arr)
        if a.shape[0] == want:
            return a
        pad = want - a.shape[0]
        shape = (pad,) if a.ndim == 1 else (pad, lanes)
        return np.concatenate([a, np.full(shape, fill, dtype=a.dtype)])

    vals, res, pt, tb, cg = [], [], [], [], []
    for m in mats:
        vals.append(pad_tiles(m, m.values, False, 128))
        res.append(pad_tiles(m, m.residue, False, 128))
        pt.append(pad_tiles(m, m.page_tab, False, 128))
        tb.append(pad_tiles(m, m.tile_base, True, 0))
        # pad chunks keep the last group id: they accumulate only zeros
        cga = np.asarray(m.chunk_group)
        want_c = t_max // _CT
        if cga.shape[0] < want_c:
            cga = np.concatenate([
                cga, np.full(want_c - cga.shape[0], cga[-1], dtype=cga.dtype)
            ])
        cg.append(cga)
    leaves = tuple(
        jax.numpy.asarray(np.stack(x)) for x in (vals, res, pt, tb, cg)
    )
    meta = (m0.num_hacks, m0.num_groups, t_max * 8, m0.x_pages)
    return leaves, meta


def partition_coo_rows_whell(
    coo: CooMatrix,
    n_shards: int,
) -> PartitionedWhell:
    """Build a :class:`PartitionedWhell` from a square host COO."""
    if coo.n_rows != coo.n_cols:
        raise ValueError("halo-partitioned SpMV requires a square matrix")
    # reuse the halo-plan construction from the HELL partitioner
    from spgpu_tpu.parallel.partition import partition_coo_rows  # noqa: F401
    import jax.numpy as jnp

    n = coo.n_rows
    chunk = round_up(-(-n // n_shards), 128)
    owner_r = coo.rows // chunk
    per_shard = []
    for s in range(n_shards):
        sel = owner_r == s
        per_shard.append(
            (coo.rows[sel] - s * chunk, coo.cols[sel], coo.values[sel])
        )

    ext_needed = []
    for s in range(n_shards):
        _, cols_g, _ = per_shard[s]
        owner_c = cols_g // chunk
        ext = np.unique(cols_g[owner_c != s]) if cols_g.size else np.array([], np.int64)
        ext_needed.append(ext)

    send_list = [[None] * n_shards for _ in range(n_shards)]
    K = 1
    for s in range(n_shards):
        ext = ext_needed[s]
        owners = ext // chunk
        for p in range(n_shards):
            lst = (ext[owners == p] - p * chunk).astype(np.int64)
            send_list[p][s] = lst
            K = max(K, lst.size)
    K = round_up(K, 8)

    send_idx = np.zeros((n_shards, n_shards, K), dtype=np.int32)
    halo_pos = []
    for s in range(n_shards):
        ext = ext_needed[s]
        owners = ext // chunk
        pos = np.empty(ext.size, dtype=np.int64)
        for p in range(n_shards):
            sel = owners == p
            lst = send_list[p][s]
            send_idx[p, s, : lst.size] = lst
            pos[sel] = p * K + np.arange(lst.size)
        halo_pos.append((ext, pos))

    int_mats, ext_mats = [], []
    for s in range(n_shards):
        lrows, cols_g, vals = per_shard[s]
        owner_c = cols_g // chunk
        is_int = owner_c == s
        int_mats.append(coo_to_whell(CooMatrix(
            lrows[is_int], (cols_g[is_int] - s * chunk), vals[is_int],
            chunk, chunk,
        )))
        ext, pos = halo_pos[s]
        ec = cols_g[~is_int]
        hp = pos[np.searchsorted(ext, ec)] if ec.size else ec
        ext_mats.append(coo_to_whell(CooMatrix(
            lrows[~is_int], hp, vals[~is_int], chunk, n_shards * K,
        )))

    int_leaves, int_meta = _pad_stack_whell(int_mats)
    ext_leaves, ext_meta = _pad_stack_whell(ext_mats)

    return PartitionedWhell(
        int_values=int_leaves[0], int_residue=int_leaves[1],
        int_page_tab=int_leaves[2], int_tile_base=int_leaves[3],
        int_chunk_group=int_leaves[4],
        ext_values=ext_leaves[0], ext_residue=ext_leaves[1],
        ext_page_tab=ext_leaves[2], ext_tile_base=ext_leaves[3],
        ext_chunk_group=ext_leaves[4],
        send_idx=jnp.asarray(send_idx),
        n_rows=n, n_shards=n_shards, chunk=chunk, halo_width=K,
        nnz=coo.nnz, int_meta=int_meta, ext_meta=ext_meta,
    )
