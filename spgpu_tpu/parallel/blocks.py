"""Single-device row blocks for LARGE packed-WHELL matrices.

The column-panel path (convert/whell.py) splits x into VMEM-sized
panels, but each (hack, panel) group then pays its own max-vs-mean slot
raggedness: measured pad 3.18x at 4.2M rows and 4.13x at 5M vs 1.74x on
the 262k flagship (BASELINE.md).  This module replaces panels for large
matrices by reusing the DISTRIBUTED partition machinery on one device:

* :func:`spgpu_tpu.parallel.partition_packed.build_shard_mats` splits
  rows into blocks and converts each block over an extended square
  space whose phantom coordinates are the block's out-of-window
  ("halo") columns — each block is a self-contained, flagship-grade
  packed matrix whose x fits VMEM, with NO panel raggedness;
* per SpMV the "halo exchange" is one tiny flat gather from the stacked
  state (boundary + hub columns, a few thousand elements) instead of a
  mesh collective; the per-block kernels pipeline under one jit exactly
  like the multi-RHS SpMM loop.

The blocks are held UNSTACKED (a tuple of per-block matrices): slicing
a stacked ``(S, T*8, 128)`` leaf inside jit materialises a copy of the
whole block slab per product — measured 3x traffic (25.9 GFLOPS at
4.2M) until the slices moved to conversion time.

FEM-profile matrices suit this split: most couplings are near-diagonal
(inside the block's own rows) and the far/hub columns are few, so halos
stay small.  A matrix where every block needs most other blocks'
columns degenerates (halo_width K explodes); the conversion inherits
the packed converter's padding guard for that shape.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import numpy as np

from spgpu_tpu.formats.coo import CooMatrix
from spgpu_tpu.parallel.partition_packed import build_shard_mats
from spgpu_tpu.utils import hostmem as _hostmem  # noqa: F401  malloc
#   tuning: embed/extract of multi-GB block states pays the §2e
#   page-fault tax otherwise

__all__ = ["BlockedPackedWhell", "coo_to_whell_blocks",
           "blocks_spmv", "blocks_spmv_tuple", "blocks_cg",
           "embed_tuple", "extract_tuple"]

_HACK = 128
#: lane-gap threshold for clustering a requester's needed owner lanes
#: into interval windows (XLA gathers cost ~47 ns/ELEMENT on TPU —
#: measured 0.51 ms for the 4-block 4.2M halo gather — while a
#: dynamic_slice of the same data is a memcpy)
_IV_GAP = 2048
#: clusters smaller than this become hub singles (one small gather)
_IV_MIN = 32
#: max intervals per (owner, requester) pair; the gap threshold doubles
#: until the clustering fits
_IV_MAX = 6


def _build_block_plan(coo: CooMatrix, S: int):
    """Interval-halo block partition: needed halo columns are clustered
    (per owner) into LANE-space interval windows exchanged as
    dynamic slices, plus a small hub-singles gather.  Returns
    (mats, plan) or None when the structure doesn't cluster (fall back
    to the flat-gather plan)."""
    from spgpu_tpu import native as _native
    from spgpu_tpu.convert.whell import coo_to_whell
    from spgpu_tpu.core import round_up
    from spgpu_tpu.formats.whell import WhellMatrix

    n = coo.n_rows
    chunk = round_up(-(-n // S), _HACK)
    owner_r = coo.rows // chunk
    per_shard = []
    for s in range(S):
        sel = owner_r == s
        per_shard.append(
            (coo.rows[sel] - s * chunk, coo.cols[sel], coo.values[sel]))

    # deterministic pre-conversion lane maps for the REAL rows of each
    # owner: the greedy hack fill walks rows in order, so the real-row
    # prefix is independent of the phantom tail; lane_capacity is passed
    # explicitly to the converter so both computations agree.
    caps, lane_real, spacers, halo_lane0 = [], [], [], []
    for s in range(S):
        lrows, _, _ = per_shard[s]
        m_s = lrows.size
        cap = max(8.0, 1.25 * m_s / max(chunk, 1))
        caps.append(cap)
        deg = np.bincount(lrows, minlength=chunk).astype(np.int64)
        d = np.clip(np.ceil(deg / cap).astype(np.int64), 1, 128)
        nat = _native.whell_hack_fill(d)
        if nat is None:
            hack_of_row = np.zeros(chunk, np.int64)
            lane_start = np.zeros(chunk, np.int64)
            h = acc = 0
            for r in range(chunk):
                if acc + d[r] > 128:
                    h += 1
                    acc = 0
                hack_of_row[r] = h
                lane_start[r] = acc
                acc += d[r]
        else:
            _, hack_of_row, lane_start = nat
            hack_of_row = hack_of_row[:chunk]
            lane_start = lane_start[:chunk]
        # out_pos compaction (mirrors _coo_to_whell_packed): lane label =
        # hack*128 + rank-of-row-within-hack
        hfirst = np.r_[True, hack_of_row[1:] != hack_of_row[:-1]]
        first_idx = np.flatnonzero(hfirst)
        out_pos = (np.arange(chunk) -
                   np.repeat(first_idx, np.diff(np.r_[first_idx, chunk])))
        lane_real.append((hack_of_row * _HACK + out_pos).astype(np.int64))
        # hack-align the phantom (halo) region: spacer phantom rows
        # (d=1) fill the last real hack to capacity so halo coord i sits
        # at lane halo_lane0 + i EXACTLY — gapless and page-aligned; the
        # kernel then splices the halo window into its x scratch (no
        # state-sized scatter/DUS on the host side)
        acc = int(lane_start[chunk - 1] + d[chunk - 1])
        spacers.append(128 - acc)
        halo_lane0.append((int(hack_of_row[chunk - 1]) + 1) * _HACK)

    # per-requester halo plan: intervals + hub singles
    plans = []  # per s: (ivs [(p, lane_a, span, coord_off)], hubs [(p, cl)])
    ext_maps = []  # per s: dict col_global -> phantom coord
    P_list = []
    for s in range(S):
        _, cols_g, _ = per_shard[s]
        owner_c = cols_g // chunk
        ext = (np.unique(cols_g[owner_c != s]) if cols_g.size
               else np.array([], np.int64))
        ivs, hubs = [], []
        coord_of = {}
        off = 0
        for p in range(S):
            sel = ext // chunk == p
            if not sel.any():
                continue
            cl = ext[sel] - p * chunk
            lanes = lane_real[p][cl]
            o = np.argsort(lanes)
            lanes_s, cl_s = lanes[o], cl[o]
            gap = _IV_GAP
            while True:
                brk = np.r_[True, np.diff(lanes_s) > gap]
                n_cl = int(brk.sum())
                if n_cl <= _IV_MAX:
                    break
                gap *= 2
            cid = np.cumsum(brk) - 1
            for c in range(n_cl):
                m = cid == c
                cnt = int(m.sum())
                if cnt < _IV_MIN:
                    for cc in cl_s[m]:
                        hubs.append((p, int(cc)))
                    continue
                a = int(lanes_s[m].min())
                b = int(lanes_s[m].max()) + 1
                ivs.append((p, a, b - a, off))
                for cc, ll in zip(cl_s[m], lanes_s[m]):
                    coord_of[p * chunk + int(cc)] = off + int(ll) - a
                off += b - a
        for hp, hc in hubs:
            coord_of[hp * chunk + hc] = off
            off += 1
        P = off
        if ext.size and P > 6 * ext.size + 1024:
            return None  # structure doesn't cluster; use flat gathers
        plans.append((ivs, hubs))
        ext_maps.append(coord_of)
        P_list.append(P)

    # extended conversions (shared geometry, explicit lane_capacity)
    from spgpu_tpu.parallel.partition_packed import _common_geometry

    E_max = chunk + max(P_list) if P_list else chunk
    gh, ct = _common_geometry(max(v.size for _, _, v in per_shard),
                              E_max, np.dtype(coo.values.dtype) == np.float64)
    mats = []
    for s in range(S):
        lrows, cols_g, vals = per_shard[s]
        owner_c = cols_g // chunk
        is_int = owner_c == s
        coord_of = ext_maps[s]
        sp = spacers[s]
        cols_e = np.where(is_int, cols_g - s * chunk, 0)
        if (~is_int).any():
            extc = cols_g[~is_int]
            cols_e[~is_int] = chunk + sp + np.fromiter(
                (coord_of[int(c)] for c in extc), np.int64, extc.size)
        E = chunk + sp + P_list[s]
        m = coo_to_whell(CooMatrix(lrows, cols_e, vals, E, E),
                         packed=True, group_hacks=gh, chunk_tiles=ct,
                         lane_capacity=caps[s])
        if not isinstance(m, WhellMatrix):
            return None
        # the pre-computed real-row lane map must match the converter's,
        # and the halo region must be gapless and page-aligned; a
        # divergence is a recoverable planning mismatch — fall back to
        # the flat-gather plan rather than failing the conversion
        lor = np.asarray(m.lane_of_row)
        if not np.array_equal(lor[:chunk], lane_real[s][:chunk]):
            return None
        hl = lor[chunk + sp:]
        if P_list[s] and not (hl[0] == halo_lane0[s] and hl[0] % 128 == 0
                              and np.all(np.diff(hl) == 1)):
            return None
        mats.append(m)
    return mats, plans, P_list, chunk, lane_real, halo_lane0, spacers


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BlockedPackedWhell:
    """Row-blocked packed WHELL for one device.  State vectors are the
    stacked per-block lane spaces ``(S, Lmax)`` (dd: ``(S, 2, Lmax)``);
    ``embed``/``extract`` map global vectors in and out."""

    mats: tuple  # of WhellMatrix, one per row block (unstacked!)
    #: flat-gather plan (fallback): (S, S*K) int32 flat indices into the
    #: (S*Lmax) state; None when the interval plan is active
    halo_src: "jax.Array | None"
    halo_win_pos: jax.Array  # (S, P_max) int32: halo lane - win_l0 (small)
    #: interval plan: hub-singles flat indices (S, H_max) int32, or None
    hub_src: "jax.Array | None"
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    chunk: int = dataclasses.field(metadata=dict(static=True))
    halo_width: int = dataclasses.field(metadata=dict(static=True))
    n_lane: int = dataclasses.field(metadata=dict(static=True))  # Lmax
    #: per-block halo lane-window starts/lengths: the phantom halo rows
    #: occupy a near-contiguous lane range, so the unpack is ONE
    #: dynamic_update_slice of a small window instead of a scatter into
    #: the multi-MB state (measured 0.9 -> 0.6 ms of glue at 4.2M)
    win_l0: tuple = dataclasses.field(metadata=dict(static=True))
    win_len: tuple = dataclasses.field(metadata=dict(static=True))
    #: interval plan (static): per block, tuple of (owner, owner_lane_a,
    #: span, coord_off) windows exchanged as dynamic slices — XLA
    #: gathers cost ~47 ns/element on TPU, slices are memcpys
    ivs: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    hub_cnt: tuple = dataclasses.field(default=(),
                                       metadata=dict(static=True))
    p_cnt: tuple = dataclasses.field(default=(),
                                     metadata=dict(static=True))
    #: interval plan, tuple-state fast path: hub-singles OWNER LANES
    #: (S requester, S owner, Hmax) + static per-(s, p) counts; the
    #: x-scratch page where each block's halo region starts (the halo
    #: lanes are gapless and page-aligned by construction — spacer
    #: phantom rows fill the shared hack)
    hub_lanes: "jax.Array | None" = None
    hub_pc: tuple = dataclasses.field(default=(),
                                      metadata=dict(static=True))
    halo_page: tuple = dataclasses.field(default=(),
                                         metadata=dict(static=True))

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def is_dd(self) -> bool:
        return self.mats[0].is_dd

    @property
    def dtype(self):
        return self.mats[0].values.dtype

    @property
    def n_blocks(self) -> int:
        return len(self.mats)

    @property
    def values(self):  # aggregate view for pad/bench accounting
        import types

        return types.SimpleNamespace(
            size=sum(int(m.values.size) for m in self.mats))

    @property
    def storage_bytes(self) -> int:
        return sum(m.storage_bytes for m in self.mats)

    def embed(self, x) -> np.ndarray:
        """Global ``(n,)`` vector → ``(S, Lmax)`` stacked lane-space
        blocks (dd: float64 ``(n,)`` → ``(S, 2, Lmax)``)."""
        x = np.asarray(x)
        S, chunk, L = self.n_blocks, self.chunk, self.n_lane
        if self.is_dd:
            from spgpu_tpu.ops.dd import split as _split

            out = np.zeros((S, 2, L), np.float32)
            pair = _split(x)
            for s, m in enumerate(self.mats):
                lo = s * chunk
                nloc = max(0, min((s + 1) * chunk, self.n_rows) - lo)
                lor = np.asarray(m.lane_of_row)[:nloc]
                out[s, :, lor] = pair[:, lo:lo + nloc].T
            return out
        out = np.zeros((S, L), x.dtype)
        for s, m in enumerate(self.mats):
            lo = s * chunk
            nloc = max(0, min((s + 1) * chunk, self.n_rows) - lo)
            out[s, np.asarray(m.lane_of_row)[:nloc]] = x[lo:lo + nloc]
        return out

    def extract(self, z) -> np.ndarray:
        z = np.asarray(z)
        S, chunk = self.n_blocks, self.chunk
        parts = []
        for s, m in enumerate(self.mats):
            nloc = max(0, min((s + 1) * chunk, self.n_rows) - s * chunk)
            lor = np.asarray(m.lane_of_row)[:nloc]
            if self.is_dd:
                from spgpu_tpu.ops.dd import join as _join

                parts.append(_join(z[s][:, lor]))
            else:
                parts.append(z[s][lor])
        return np.concatenate(parts)


def coo_to_whell_blocks(coo: CooMatrix, n_blocks=None,
                        interval_halos: bool = True) -> BlockedPackedWhell:
    """Build the row-blocked packed layout.  ``n_blocks`` defaults to
    the smallest count whose per-block x + accumulator fits VMEM.  The
    interval-halo plan is preferred (boundary halos move as dynamic
    slices); matrices whose halo columns don't cluster fall back to one
    batched flat gather."""
    import jax.numpy as jnp

    if np.issubdtype(np.dtype(coo.values.dtype), np.complexfloating):
        raise ValueError(
            "complex matrices are not supported by the row-blocked "
            "layout yet; use a single-device complex layout (WHELL/"
            "WHDIA plane pairs)")
    if n_blocks is None:
        # per-block lane space ~ 1.4x chunk rows; budget ~7 MiB of x
        # next to the gh=512 accumulator scratch (DESIGN §2g).  dd
        # (float64) stages hi+lo planes: 8 B per lane.
        itemsize = 8 if np.dtype(coo.values.dtype) == np.float64 else 4
        per_block_rows = int(7 * 2 ** 20 / itemsize / 1.4)
        n_blocks = max(1, -(-coo.n_rows // per_block_rows))

    plan = _build_block_plan(coo, n_blocks) if interval_halos and \
        n_blocks > 1 else None
    if plan is not None:
        import dataclasses as _dc

        mats, plans, P_list, chunk, lane_real, halo_lane0, spacers = plan
        # force x_pages == the kernel OUTPUT length / 128 (num_groups *
        # group_hacks) so the tuple fast path reshapes the state array
        # into the kernel's x operand AND takes the kernel output as the
        # next state with ZERO copies
        mats = [_dc.replace(m, x_pages=m.num_groups * m.group_hacks)
                for m in mats]
        S = len(mats)
        Lmax = max(m.n_rows for m in mats)
        Pmax = max(max(P_list), 1)
        Hmax = max(max((len(h) for _, h in plans), default=0), 1)
        win_pos = np.zeros((S, Pmax), np.int32)
        hub_src = np.zeros((S, Hmax), np.int32)
        hub_lanes = np.zeros((S, S, Hmax), np.int32)
        l0s, wls, ivs_t, hub_cnt, hub_pc = [], [], [], [], []
        for s in range(S):
            lor = np.asarray(mats[s].lane_of_row)
            P = P_list[s]
            pl_ = lor[chunk + spacers[s]:chunk + spacers[s] + P]
            if P:
                l0 = int(pl_.min())
                wl = int(pl_.max()) + 1 - l0
                win_pos[s, :P] = pl_ - l0
                if l0 != halo_lane0[s] or wl != P:  # gapless/aligned
                    raise ValueError(
                        "halo lane window not gapless/page-aligned "
                        f"(l0={l0} vs {halo_lane0[s]}, len={wl} vs {P})")
            else:
                l0, wl = halo_lane0[s], 1
            l0s.append(l0)
            wls.append(wl)
            ivs_s, hubs_s = plans[s]
            ivs_t.append(tuple(ivs_s))
            hub_cnt.append(len(hubs_s))
            pc = [0] * S
            for j, (hp, hc) in enumerate(hubs_s):
                hub_src[s, j] = hp * Lmax + lane_real[hp][hc]
                hub_lanes[s, hp, pc[hp]] = lane_real[hp][hc]
                pc[hp] += 1
            hub_pc.append(tuple(pc))
        return BlockedPackedWhell(
            mats=tuple(mats), halo_src=None,
            halo_win_pos=jnp.asarray(win_pos),
            hub_src=jnp.asarray(hub_src),
            n_rows=coo.n_rows, n_cols=coo.n_cols, nnz=coo.nnz,
            chunk=chunk, halo_width=0, n_lane=Lmax,
            win_l0=tuple(l0s), win_len=tuple(wls),
            ivs=tuple(ivs_t), hub_cnt=tuple(hub_cnt),
            p_cnt=tuple(P_list),
            hub_lanes=jnp.asarray(hub_lanes), hub_pc=tuple(hub_pc),
            halo_page=tuple(h // _HACK for h in halo_lane0))

    mats, send_idx, chunk, K, _ = build_shard_mats(coo, n_blocks)
    S = len(mats)
    Lmax = max(m.n_rows for m in mats)
    halo_src = np.empty((S, S * K), np.int32)
    halo_lanes = np.empty((S, S * K), np.int32)
    for s in range(S):
        halo_lanes[s] = np.asarray(mats[s].lane_of_row)[chunk:]
        for p in range(S):
            lanes_p = np.asarray(mats[p].lane_of_row)[send_idx[p, s]]
            halo_src[s, p * K:(p + 1) * K] = p * Lmax + lanes_p
    l0 = halo_lanes.min(axis=1)
    wlen = halo_lanes.max(axis=1) + 1 - l0
    return BlockedPackedWhell(
        mats=tuple(mats), halo_src=jnp.asarray(halo_src),
        halo_win_pos=jnp.asarray(halo_lanes - l0[:, None]),
        hub_src=None,
        n_rows=coo.n_rows, n_cols=coo.n_cols, nnz=coo.nnz,
        chunk=chunk, halo_width=K, n_lane=Lmax,
        win_l0=tuple(int(v) for v in l0),
        win_len=tuple(int(v) for v in wlen))


def blocks_spmv(a: BlockedPackedWhell, x_st, interpret=None):
    """``Z = A @ X`` over the stacked lane-space state ``(S, Lmax)``
    (dd: ``(S, 2, Lmax)``); returns the same shape.  One packed Pallas
    kernel per block under one jit; the halo values come from a flat
    gather of the stacked state."""
    import jax.numpy as jnp

    from spgpu_tpu.ops import whell_spmv

    S, L = a.n_blocks, a.n_lane
    interval = a.halo_src is None
    if a.is_dd:
        flat = jnp.swapaxes(x_st, 0, 1).reshape(2, -1)
    else:
        flat = x_st.reshape(-1)
    if not interval:
        halos = (flat[:, a.halo_src] if a.is_dd else flat[a.halo_src])
    outs = []
    for s, mat in enumerate(a.mats):
        wl = a.win_len[s]
        if interval:
            P = a.p_cnt[s]
            if P == 0:
                xf = x_st[s]
            else:
                parts = []
                for (p, a_lane, span, _off) in a.ivs[s]:
                    if a.is_dd:
                        parts.append(jax.lax.dynamic_slice(
                            x_st[p], (0, a_lane), (2, span)))
                    else:
                        parts.append(jax.lax.dynamic_slice(
                            x_st[p], (a_lane,), (span,)))
                if a.hub_cnt[s]:
                    parts.append(flat[..., a.hub_src[s, : a.hub_cnt[s]]])
                hv = jnp.concatenate(parts, axis=-1)
                pos = a.halo_win_pos[s, :P]
                if a.is_dd:
                    win = jnp.zeros((2, wl), x_st.dtype).at[:, pos].set(hv)
                    xf = jax.lax.dynamic_update_slice(
                        x_st[s], win, (0, a.win_l0[s]))
                else:
                    win = jnp.zeros((wl,), x_st.dtype).at[pos].set(hv)
                    xf = jax.lax.dynamic_update_slice(
                        x_st[s], win, (a.win_l0[s],))
        elif a.is_dd:
            win = jnp.zeros((2, wl), x_st.dtype).at[
                :, a.halo_win_pos[s]].set(halos[:, s])
            xf = jax.lax.dynamic_update_slice(
                x_st[s], win, (0, a.win_l0[s]))
        else:
            win = jnp.zeros((wl,), x_st.dtype).at[
                a.halo_win_pos[s]].set(halos[s])
            xf = jax.lax.dynamic_update_slice(x_st[s], win, (a.win_l0[s],))
        z = whell_spmv(mat, xf[..., : mat.n_cols], interpret=interpret)
        pad = L - z.shape[-1]
        if pad:
            z = jnp.pad(z, [(0, 0)] * (z.ndim - 1) + [(0, pad)])
        outs.append(z)
    return jnp.stack(outs)


def blocks_spmv_tuple(a: BlockedPackedWhell, xs: tuple, interpret=None):
    """Zero-copy ``Z = A @ X`` over a TUPLE of per-block lane-space
    vectors (interval plans; fp32 ``(L,)`` or dd ``(2, L)`` hi/lo
    stacks per block).  Each block's state array is reshaped (free)
    into the kernel's x operand; the halo values are assembled from
    dynamic slices of neighbour states plus a small hub gather and
    SPLICED INTO THE KERNEL'S x SCRATCH after the staging DMA
    (``halo_page``), so no multi-MB buffer is copied per product — the
    stacked-state path pays ~0.3-0.45 ms of slice/update/stack traffic
    per product at the 5M class."""
    import jax.numpy as jnp

    from spgpu_tpu.ops.pallas_kernels import (
        _whell_packed_call, _whell_packed_dd_call)

    if a.halo_src is not None:
        raise ValueError("blocks_spmv_tuple requires an "
                         "interval-halo plan (coo_to_whell_blocks default)")
    dd = a.is_dd
    if interpret is None:
        import jax as _jax

        interpret = _jax.default_backend() != "tpu"
    outs = []
    for s, mat in enumerate(a.mats):
        P = a.p_cnt[s]
        halo_win = None
        halo_page = None
        if P:
            if dd:
                parts = [jax.lax.dynamic_slice(xs[p], (0, a_lane), (2, span))
                         for (p, a_lane, span, _off) in a.ivs[s]]
            else:
                parts = [jax.lax.dynamic_slice(xs[p], (a_lane,), (span,))
                         for (p, a_lane, span, _off) in a.ivs[s]]
            for p in range(a.n_blocks):
                c = a.hub_pc[s][p]
                if c:
                    parts.append(xs[p][..., a.hub_lanes[s, p, :c]])
            hv = jnp.concatenate(parts, axis=-1) if len(parts) > 1 \
                else parts[0]
            wp = -(-P // _HACK)
            padw = wp * _HACK - P
            if padw:
                hv = jnp.pad(hv, [(0, 0)] * (hv.ndim - 1) + [(0, padw)])
            halo_win = hv.reshape(hv.shape[:-1] + (wp, _HACK))
            halo_page = a.halo_page[s]
        if dd:
            x3d = xs[s].reshape(2, -1, _HACK)  # x_pages == n_lane/128
            z = _whell_packed_dd_call(
                mat.values, mat.values_lo, mat.residue, mat.page_tab,
                mat.seg_lo, mat.seg_hi, mat.tile_base, mat.chunk_group,
                x3d, halo_win,
                num_tiles=mat.num_tiles, num_groups=mat.num_groups,
                x_pages=mat.x_pages, window_pages=mat.window_pages,
                chunk_tiles=mat.chunk_tiles, group_hacks=mat.group_hacks,
                halo_page=halo_page, interpret=interpret,
                unit_segments=mat.unit_segments,
            ).reshape(2, -1)
        else:
            x2d = xs[s].reshape(-1, _HACK)  # x_pages == n_lane/128: free
            z = _whell_packed_call(
                mat.values, mat.residue, mat.page_tab, mat.seg_lo,
                mat.seg_hi, mat.tile_base, mat.chunk_group, x2d,
                mat.group_bases, halo_win,
                num_tiles=mat.num_tiles, num_groups=mat.num_groups,
                x_pages=mat.x_pages, window_pages=mat.window_pages,
                chunk_tiles=mat.chunk_tiles, group_hacks=mat.group_hacks,
                halo_page=halo_page, interpret=interpret,
                unit_segments=mat.unit_segments,
            ).reshape(-1)
        outs.append(z)
    return tuple(outs)


def embed_tuple(a: BlockedPackedWhell, x):
    """Global ``(n,)`` vector -> tuple of per-block state vectors
    (length = the block kernel's output width; zero-copy protocol).
    dd: float64 ``(n,)`` -> per-block ``(2, L)`` hi/lo stacks."""
    x = np.asarray(x)
    out = []
    if a.is_dd:
        from spgpu_tpu.ops.dd import split as _split

        pair = _split(np.asarray(x, np.float64))
        for s, m in enumerate(a.mats):
            lo = s * a.chunk
            nloc = max(0, min((s + 1) * a.chunk, a.n_rows) - lo)
            v = np.zeros((2, m.x_pages * _HACK), np.float32)
            v[:, np.asarray(m.lane_of_row)[:nloc]] = pair[:, lo:lo + nloc]
            out.append(v)
        return out
    for s, m in enumerate(a.mats):
        lo = s * a.chunk
        nloc = max(0, min((s + 1) * a.chunk, a.n_rows) - lo)
        v = np.zeros(m.x_pages * _HACK, x.dtype)
        v[np.asarray(m.lane_of_row)[:nloc]] = x[lo:lo + nloc]
        out.append(v)
    return out


def extract_tuple(a: BlockedPackedWhell, zs) -> np.ndarray:
    parts = []
    for s, m in enumerate(a.mats):
        nloc = max(0, min((s + 1) * a.chunk, a.n_rows) - s * a.chunk)
        lor = np.asarray(m.lane_of_row)[:nloc]
        if a.is_dd:
            from spgpu_tpu.ops.dd import join as _join

            parts.append(_join(np.asarray(zs[s])[:, lor]))
        else:
            parts.append(np.asarray(zs[s])[lor])
    return np.concatenate(parts)


def blocks_cg(a: BlockedPackedWhell, b, x0=None, tol: float = 1e-6,
              maxiter: int = 1000, m_inv=None, interpret=None):
    """CG over the tuple state (interval plans): the matvec is
    :func:`blocks_spmv_tuple`; reductions sum per-block partials.
    ``b`` is a global ``(n,)`` host vector; returns a CgResult whose
    ``x`` is in original numbering.  float64 systems run double-float
    CG over tuples of ``(2, L)`` hi/lo stacks with error-free
    cross-block reductions (the zero-copy protocol carried to the
    D-precision class — VERDICT r3 item 8)."""
    import jax.numpy as jnp

    from spgpu_tpu.solvers.cg import CgResult

    if a.is_dd:
        return _blocks_cg_dd(a, b, x0, tol, maxiter, m_inv, interpret)
    bs = tuple(jnp.asarray(v) for v in embed_tuple(a, b))
    x0s = (None if x0 is None
           else tuple(jnp.asarray(v) for v in embed_tuple(a, np.asarray(x0))))
    mns = (None if m_inv is None
           else tuple(jnp.asarray(v) for v in _embed_minv(a, m_inv)))
    x, k, rn, conv = _run_blocks_cg(a, bs, mns, x0s, tol=float(tol),
                                    maxiter=int(maxiter),
                                    interpret=interpret)
    xs = extract_tuple(a, x)
    return CgResult(x=xs, iterations=k, residual_norm=rn, converged=conv)


# MODULE-LEVEL jitted runner: a jit defined inside blocks_cg is a new
# function object per call, so every solve RETRACED AND RECOMPILED the
# whole CG program (measured 4.2M dd: ~35 s/solve of pure compile
# mistaken for per-iteration cost).  `am` is a jit ARGUMENT, not a
# closure capture: captured slabs are baked into the HLO as literals
# and shipped with the (relayed) compile request — GBs at the 4M class
# (utils/timing.chained_time doc; observed as a relay broken pipe).
@functools.partial(jax.jit,
                   static_argnames=("tol", "maxiter", "interpret"))
def _run_blocks_cg(am, bs, mns, x0s, *, tol, maxiter, interpret):
    import jax.numpy as jnp

    def tdot(u, v):
        return sum(jnp.vdot(us, vs) for us, vs in zip(u, v))

    def taxpy(alpha, u, beta, v):
        return tuple(alpha * us + beta * vs for us, vs in zip(u, v))

    mv = lambda v: blocks_spmv_tuple(am, v, interpret=interpret)
    x0 = (tuple(jnp.zeros_like(v) for v in bs) if x0s is None else x0s)
    r0 = (bs if x0s is None
          else taxpy(1.0, bs, -1.0, mv(x0s)))
    z0 = (r0 if mns is None
          else tuple(rs * ms for rs, ms in zip(r0, mns)))
    rz0 = tdot(r0, z0)
    bn = jnp.sqrt(tdot(bs, bs))
    bn = jnp.where(bn == 0, 1.0, bn)

    def cond(st):
        x, r, z, p, rz, k = st
        return (jnp.sqrt(tdot(r, r)) > tol * bn) & (k < maxiter)

    def body(st):
        x, r, z, p, rz, k = st
        ap = mv(p)
        alpha = rz / tdot(p, ap)
        x = taxpy(1.0, x, alpha, p)
        r = taxpy(1.0, r, -alpha, ap)
        z = (r if mns is None
             else tuple(rs * ms for rs, ms in zip(r, mns)))
        rz_new = tdot(r, z)
        beta = rz_new / rz
        p = taxpy(1.0, z, beta, p)
        return (x, r, z, p, rz_new, k + 1)

    x, r, z, p, rz, k = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, rz0, jnp.int32(0)))
    rn = jnp.sqrt(tdot(r, r))
    return x, k, rn, rn <= tol * bn


def _blocks_cg_dd(a: BlockedPackedWhell, b, x0, tol, maxiter, m_inv,
                  interpret):
    """Double-float CG over the tuple state: per-block ``(2, L)`` hi/lo
    stacks through the zero-copy dd kernel (halo spliced in-kernel),
    dd scalars, and error-free cross-block dot reductions — the tuple
    analogue of :func:`spgpu_tpu.solvers.cg.cg_dd`."""
    import jax.numpy as jnp

    from spgpu_tpu.ops import dd
    from spgpu_tpu.solvers.cg import CgResult

    bs = tuple(jnp.asarray(v) for v in embed_tuple(a, b))
    x0s = (None if x0 is None
           else tuple(jnp.asarray(v) for v in embed_tuple(a, np.asarray(x0))))
    mns = (None if m_inv is None
           else tuple(jnp.asarray(v) for v in _embed_minv(a, m_inv)))
    x, k, rn, conv = _run_blocks_cg_dd(a, bs, mns, x0s, tol=float(tol),
                                       maxiter=int(maxiter),
                                       interpret=interpret)
    xs = extract_tuple(a, x)
    return CgResult(x=xs, iterations=k, residual_norm=rn, converged=conv)


# module-level jitted runner: see _run_blocks_cg (per-call jits retrace
# and recompile the whole program; captured slabs ship as HLO literals)
@functools.partial(jax.jit,
                   static_argnames=("tol", "maxiter", "interpret"))
def _run_blocks_cg_dd(am, bs, mns_, x0s, *, tol, maxiter, interpret):
    import jax.numpy as jnp

    from spgpu_tpu.ops import dd

    pin = jax.lax.optimization_barrier

    def tdot(u, v):
        h, l = dd.dd_dot(u[0], v[0])
        for us, vs in zip(u[1:], v[1:]):
            h2, l2 = dd.dd_dot(us, vs)
            h, l = dd.dd_add_dd(h, l, h2, l2)
        return h, l

    def taxpy(alpha_pair, p, x):  # x + alpha*p, all dd, per block
        out = []
        for ps, xs_ in zip(p, x):
            ph, pe = dd.dd_mul(ps[0], ps[1], alpha_pair[0], alpha_pair[1])
            h, l = dd.dd_add_dd(xs_[0], xs_[1], ph, pe)
            out.append(jnp.stack([h, l]))
        return tuple(out)

    mv = lambda v: blocks_spmv_tuple(am, v, interpret=interpret)

    def prec(v):
        if mns_ is None:
            return v
        out = []
        for vs, ms in zip(v, mns_):
            h, l = dd.dd_mul(vs[0], vs[1], ms, jnp.zeros_like(ms))
            out.append(jnp.stack([h, l]))
        return tuple(out)

    x0t = (tuple(jnp.zeros_like(v) for v in bs) if x0s is None else x0s)
    if x0s is None:
        r0 = bs
    else:
        ax = mv(x0t)
        r0 = tuple(
            jnp.stack(dd.dd_add_dd(bsv[0], bsv[1], -av[0], -av[1]))
            for bsv, av in zip(bs, ax))
    z0 = prec(r0)
    rz0 = tdot(r0, z0)
    bn = jnp.sqrt(jnp.maximum(tdot(bs, bs)[0], 0.0))
    bn = jnp.where(bn == 0, 1.0, bn)

    def cond(st):
        x, r, z, p, rz, k = st
        return (jnp.sqrt(jnp.maximum(tdot(r, r)[0], 0.0))
                > tol * bn) & (k < maxiter)

    def body(st):
        x, r, z, p, rz, k = st
        ap = pin(mv(p))
        pap = tdot(p, ap)
        alpha = pin(dd.dd_div(rz[0], rz[1], pap[0], pap[1]))
        x = pin(taxpy(alpha, p, x))
        r = pin(taxpy((-alpha[0], -alpha[1]), ap, r))
        z = prec(r)
        rz_new = tdot(r, z)
        beta = pin(dd.dd_div(rz_new[0], rz_new[1], rz[0], rz[1]))
        p = pin(tuple(
            jnp.stack(dd.dd_add_dd(
                zs[0], zs[1],
                *dd.dd_mul(ps[0], ps[1], beta[0], beta[1])))
            for zs, ps in zip(z, p)))
        return (x, r, z, p, jnp.stack(rz_new), k + 1)

    x, r, z, p, rz, k = jax.lax.while_loop(
        cond, body, (x0t, r0, z0, z0, jnp.stack(rz0), jnp.int32(0)))
    rn = jnp.sqrt(jnp.maximum(tdot(r, r)[0], 0.0))
    return x, k, rn, rn <= tol * bn


def _embed_minv(a: BlockedPackedWhell, m_inv):
    out = []
    for s, m in enumerate(a.mats):
        lo = s * a.chunk
        nloc = max(0, min((s + 1) * a.chunk, a.n_rows) - lo)
        v = np.ones(m.x_pages * _HACK, np.float32)
        v[np.asarray(m.lane_of_row)[:nloc]] = np.asarray(
            m_inv, np.float64)[lo:lo + nloc]
        out.append(v)
    return out
