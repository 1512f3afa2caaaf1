"""Row partitioning onto PACKED WHELL slabs — the production fast path
inside ``shard_map``.

The r2 distributed layer ran the *classic* WHELL layout per shard
(:mod:`spgpu_tpu.parallel.partition_whell`); the packed-lane layout (the
98-GFLOPS single-chip kernel, :mod:`spgpu_tpu.formats.whell`) never
executed inside a mesh.  This module closes that gap.

Design: each shard's local block — interior columns AND halo columns —
converts as ONE packed matrix over an *extended square space* of
``chunk + S*K`` coordinates:

* coordinates ``0..chunk-1`` are the shard's local rows/columns;
* coordinates ``chunk..chunk+S*K-1`` are **phantom halo rows** (no
  matrix entries) whose lane-space labels serve as the halo *columns*:
  exterior entries point at ``chunk + halo_pos``.

The packed converter relabels rows and columns jointly into lane space,
so the halo slots get lane coordinates for free; per SpMV the received
halo block is scattered into those lanes (``x.at[halo_lanes].set``, a
few hundred elements) and ONE packed kernel computes interior +
exterior together — no separate exterior slab, no per-product output
remap.  Phantom rows have no entries, so their output lanes stay zero
and the Krylov state is closed under the matvec.

The reference has no distributed layer (SURVEY §2.6); its device-side
halo primitives were ``gath``/``scat`` + the OELL permutation
(``gath_base.cuh:32-85``, ``ell.c:161-202``).  Here the pack is a lane
gather, the exchange one ``jax.lax.all_to_all`` over the mesh axis, and
the unpack a lane scatter — all device-resident.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from spgpu_tpu.core import round_up
from spgpu_tpu.formats import CooMatrix, WhellMatrix
from spgpu_tpu.convert.whell import coo_to_whell

__all__ = ["PackedPartition", "ComplexPackedPartition",
           "partition_coo_rows_packed", "build_shard_mats"]

_HACK = 128


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedPartition:
    """Row-partitioned square matrix; one packed-WHELL slab per shard
    over the extended (local + halo) coordinate space.  Every array
    leaf has a leading shard axis and shards along it."""

    values: jax.Array  # (S, T*8, 128)
    residue: jax.Array  # (S, T*8, 128) int8
    page_tab: jax.Array  # (S, T*8, 128) int8
    seg_lo: jax.Array  # (S, num_groups*gh, 128) int8
    seg_hi: jax.Array  # (S, num_groups*gh, 128) int8
    tile_base: jax.Array  # (S, T) int32
    chunk_group: jax.Array  # (S, n_chunks+1) int32 (trailing -1 sentinel)
    lane_of_row: jax.Array  # (S, chunk + S*K) int32: extended-space -> lane
    send_lane_idx: jax.Array  # (S, S, K) int32: LANE coords on the owner
    halo_lanes: jax.Array  # (S, S*K) int32: lane coords of halo slots
    group_bases: Optional[jax.Array]  # (S, LG*K) int32 | None (scattered)
    values_lo: Optional[jax.Array]  # (S, T*8, 128) | None (dd)
    # exterior (halo-column) slab sharing the same lane space; present
    # when the partition was built with overlap=True (the interior
    # product then runs concurrently with the halo all-to-all)
    ext_values: Optional[jax.Array]  # (S, Te*8, 128) | None
    ext_residue: Optional[jax.Array]
    ext_page_tab: Optional[jax.Array]
    ext_tile_base: Optional[jax.Array]  # (S, Te) int32
    ext_chunk_group: Optional[jax.Array]
    ext_group_bases: Optional[jax.Array]
    ext_values_lo: Optional[jax.Array]
    # static metadata (common across shards after padding)
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    chunk: int = dataclasses.field(metadata=dict(static=True))
    halo_width: int = dataclasses.field(metadata=dict(static=True))  # K
    nnz: int = dataclasses.field(metadata=dict(static=True))
    num_hacks: int = dataclasses.field(metadata=dict(static=True))
    num_groups: int = dataclasses.field(metadata=dict(static=True))
    total_slots: int = dataclasses.field(metadata=dict(static=True))
    x_pages: int = dataclasses.field(metadata=dict(static=True))
    window_pages: int = dataclasses.field(metadata=dict(static=True))
    group_hacks: int = dataclasses.field(metadata=dict(static=True))
    chunk_tiles: int = dataclasses.field(metadata=dict(static=True))
    ext_total_slots: int = dataclasses.field(metadata=dict(static=True),
                                             default=0)
    ext_chunk_tiles: int = dataclasses.field(metadata=dict(static=True),
                                             default=0)
    #: (S, S) nested tuple: ``halo_counts[p][s]`` = REAL lanes owner p
    #: sends requester s (the all-to-all moves S*K padded slots per
    #: pair; the difference is K-padding waste — instrumented by
    #: ``bench.harness.run_weak_scaling``)
    halo_counts: tuple = dataclasses.field(metadata=dict(static=True),
                                           default=())
    # --- ragged per-offset exchange plan (r5): pairs bucketed by ring
    # offset o = (requester - owner) mod S, one ``lax.ppermute`` per
    # LIVE offset at that offset's own width (zero-width pairs are
    # omitted from the perm) — replaces the global-max-K all-to-all
    # whose padding waste measured 75-94% on banded partitions (SURVEY
    # §7 ragged-halo contract; the pack/unpack primitives match
    # ``gath_base.cuh:32-85``).  Empty tuples -> legacy all_to_all.
    halo_send_off: tuple = ()  # of (S, K_o) int32 owner lane coords
    halo_recv_off: tuple = ()  # of (S, K_o) int32 requester halo lanes
    #: static ((offset, ((src, dst), ...)), ...) ppermute specs
    halo_offsets: tuple = dataclasses.field(metadata=dict(static=True),
                                            default=())
    #: every shard's rows own exactly one lane (stencil/banded degree
    #: profiles) — the kernels skip the flush scan (r5, DESIGN §2c-3)
    unit_segments: bool = dataclasses.field(metadata=dict(static=True),
                                            default=False)

    @property
    def is_dd(self) -> bool:
        return self.values_lo is not None

    @property
    def overlapped(self) -> bool:
        """True when the exterior slab is split out for halo/compute
        overlap (see :func:`build_shard_mats` ``split_exterior``)."""
        return self.ext_values is not None

    @property
    def n_lane(self) -> int:
        """Per-shard lane-space length (the Krylov state width)."""
        return self.num_groups * self.group_hacks * _HACK

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

    def local_view(self, lpm) -> WhellMatrix:
        """One shard's packed WhellMatrix from its block-sliced leaves
        (leading shard axis of size 1)."""
        return WhellMatrix(
            values=lpm.values[0], residue=lpm.residue[0],
            page_tab=lpm.page_tab[0], tile_base=lpm.tile_base[0],
            chunk_group=lpm.chunk_group[0], row_perm=None,
            n_rows=self.n_lane, n_cols=self.x_pages * _HACK,
            num_hacks=self.num_hacks, num_groups=self.num_groups,
            total_slots=self.total_slots, nnz=0, x_pages=self.x_pages,
            seg_lo=lpm.seg_lo[0], seg_hi=lpm.seg_hi[0],
            lane_of_row=lpm.lane_of_row[0],
            values_lo=None if self.values_lo is None else lpm.values_lo[0],
            group_bases=(None if self.group_bases is None
                         else lpm.group_bases[0]),
            window_pages=self.window_pages, orig_rows=self.chunk,
            group_hacks=self.group_hacks, chunk_tiles=self.chunk_tiles,
            unit_segments=self.unit_segments,
        )

    def local_view_ext(self, lpm) -> WhellMatrix:
        """One shard's EXTERIOR packed WhellMatrix (halo-column entries
        only), sharing the interior's lane space / seg slabs."""
        return WhellMatrix(
            values=lpm.ext_values[0], residue=lpm.ext_residue[0],
            page_tab=lpm.ext_page_tab[0], tile_base=lpm.ext_tile_base[0],
            chunk_group=lpm.ext_chunk_group[0], row_perm=None,
            n_rows=self.n_lane, n_cols=self.x_pages * _HACK,
            num_hacks=self.num_hacks, num_groups=self.num_groups,
            total_slots=self.ext_total_slots, nnz=0, x_pages=self.x_pages,
            seg_lo=lpm.seg_lo[0], seg_hi=lpm.seg_hi[0],
            lane_of_row=lpm.lane_of_row[0],
            values_lo=(None if self.ext_values_lo is None
                       else lpm.ext_values_lo[0]),
            group_bases=(None if self.ext_group_bases is None
                         else lpm.ext_group_bases[0]),
            window_pages=self.window_pages, orig_rows=self.chunk,
            group_hacks=self.group_hacks, chunk_tiles=self.ext_chunk_tiles,
            unit_segments=self.unit_segments,
        )

    # --- host-side embed/extract between global vectors and the stacked
    # per-shard lane spaces -------------------------------------------------

    def embed(self, x: np.ndarray) -> np.ndarray:
        """Global ``(n,)`` vector → ``(S, L)`` stacked lane-space blocks
        (dd: ``(n,) float64`` → ``(S, 2, L)`` hi/lo)."""
        x = np.asarray(x)
        lor = np.asarray(self.lane_of_row)
        L = self.n_lane
        S, chunk = self.n_shards, self.chunk
        if self.is_dd:
            from spgpu_tpu.ops.dd import split as _split

            out = np.zeros((S, 2, L), np.float32)
            pair = _split(x)
            for s in range(S):
                lo_ = s * chunk
                nloc = max(0, min((s + 1) * chunk, self.n_rows) - lo_)
                out[s, :, lor[s, :nloc]] = pair[:, lo_:lo_ + nloc].T
            return out
        out = np.zeros((S, L), x.dtype)
        for s in range(S):
            lo_ = s * chunk
            nloc = max(0, min((s + 1) * chunk, self.n_rows) - lo_)
            out[s, lor[s, :nloc]] = x[lo_:lo_ + nloc]
        return out

    def extract(self, z) -> np.ndarray:
        """Stacked ``(S, L)`` lane-space blocks → global ``(n,)``
        (dd: ``(S, 2, L)`` → float64)."""
        z = np.asarray(z)
        lor = np.asarray(self.lane_of_row)
        S, chunk = self.n_shards, self.chunk
        if self.is_dd:
            from spgpu_tpu.ops.dd import join as _join

            parts = []
            for s in range(S):
                nloc = max(0, min((s + 1) * chunk, self.n_rows) - s * chunk)
                parts.append(_join(z[s][:, lor[s, :nloc]]))
            return np.concatenate(parts)
        parts = []
        for s in range(S):
            nloc = max(0, min((s + 1) * chunk, self.n_rows) - s * chunk)
            parts.append(z[s][lor[s, :nloc]])
        return np.concatenate(parts)


def _common_geometry(max_nnz: int, max_rows: int, is_dd: bool):
    """(group_hacks, chunk_tiles) shared by every shard — the same
    measured heuristics as ``coo_to_whell`` applied to the LARGEST
    shard, so stacked leaves agree by construction."""
    est_tiles = max(1, max_nnz // 1024)
    num_hacks = -(-max_rows // _HACK)
    if is_dd:
        ct = 32 if est_tiles >= 128 else 16
        gh = 128 if num_hacks >= 128 else 32
    else:
        ct = 128 if est_tiles >= 512 else (64 if est_tiles >= 128 else 32)
        gh = 512 if num_hacks >= 512 else (128 if num_hacks >= 128 else 32)
    return gh, ct


def build_shard_mats(coo: CooMatrix, n_shards: int,
                     split_exterior: bool = False):
    """Shared partition front-end: split rows into hack-aligned chunks,
    build the halo plan, and convert each shard's block over the
    extended (chunk + S*K phantom-halo) square space with a COMMON
    geometry.  Returns ``(mats, send_idx, chunk, K, halo_counts)`` —
    used stacked (``partition_coo_rows_packed`` → shard_map) or
    unstacked (``parallel.blocks`` → single-device row blocks).

    ``split_exterior=True`` converts each shard's INTERIOR entries
    (columns owned locally) and EXTERIOR entries (halo columns) as two
    separate packed slabs sharing ONE lane space (the converter's lane
    map is pinned via ``row_degrees``/``lane_capacity`` computed from
    the full local entry set), so the distributed SpMV can run the
    interior product concurrently with the halo all-to-all and add the
    small exterior product after — the interior/boundary reorder trick
    of ``/root/reference/src/core/ell.c:161-202`` as a SCHEDULING
    split, with no output permutation (both products live in the same
    lane space and sum exactly).  ``mats`` entries become
    ``(m_int, m_ext)`` pairs."""
    if coo.n_rows != coo.n_cols:
        raise ValueError("halo-partitioned SpMV requires a square matrix")
    if np.issubdtype(np.dtype(coo.values.dtype), np.complexfloating):
        # complex goes through ComplexPackedPartition (plane pairs);
        # this stacker keys fp32-vs-dd only
        raise ValueError(
            "complex matrices partition as plane pairs — use "
            "partition_coo_rows_packed (which dispatches to "
            "ComplexPackedPartition) rather than build_shard_mats")
    n = coo.n_rows
    chunk = round_up(-(-n // n_shards), _HACK)
    owner_r = coo.rows // chunk
    per_shard = []
    for s in range(n_shards):
        sel = owner_r == s
        per_shard.append(
            (coo.rows[sel] - s * chunk, coo.cols[sel], coo.values[sel]))

    # halo plan (same construction as partition_coo_rows)
    ext_needed = []
    for s in range(n_shards):
        _, cols_g, _ = per_shard[s]
        owner_c = cols_g // chunk
        ext = (np.unique(cols_g[owner_c != s]) if cols_g.size
               else np.array([], np.int64))
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
    halo_counts = tuple(tuple(send_list[p][s].size for s in range(n_shards))
                        for p in range(n_shards))
    K = round_up(K, 8)

    send_idx = np.zeros((n_shards, n_shards, K), dtype=np.int64)
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

    # per-shard packed conversion over the extended square space
    E = chunk + n_shards * K
    is_dd = np.dtype(coo.values.dtype) == np.float64
    gh, ct = _common_geometry(max(v.size for _, _, v in per_shard),
                              E, is_dd)
    mats = []
    for s in range(n_shards):
        lrows, cols_g, vals = per_shard[s]
        owner_c = cols_g // chunk
        is_int = owner_c == s
        ext, pos = halo_pos[s]
        ec = cols_g[~is_int]
        hp = pos[np.searchsorted(ext, ec)] if ec.size else ec
        rows_e = lrows
        cols_e = np.where(is_int, cols_g - s * chunk,
                          chunk + np.zeros_like(cols_g))
        cols_e = cols_e.copy()
        cols_e[~is_int] = chunk + hp

        def _conv(rr, cc, vv, ct=ct, **kw):
            m = coo_to_whell(CooMatrix(rr, cc, vv, E, E), packed=True,
                             group_hacks=gh, chunk_tiles=ct, **kw)
            if not isinstance(m, WhellMatrix):
                raise ValueError(
                    "a shard's packed layout needed panels/segments "
                    f"({type(m).__name__}) — use more shards or the "
                    "classic partition for this size")
            return m

        if not split_exterior:
            mats.append(_conv(rows_e, cols_e, vals))
            continue
        # pin the lane map to the FULL local entry set so the interior
        # and exterior slabs share one lane space (products sum exactly)
        deg_full = np.bincount(rows_e, minlength=E).astype(np.int64)
        cap = max(8.0, 1.25 * vals.size / max(E, 1))
        m_int = _conv(rows_e[is_int], cols_e[is_int], vals[is_int],
                      row_degrees=deg_full, lane_capacity=cap)
        # the exterior slab is tiny (halo entries only) but pays a
        # ct-tile floor per output group — use the smallest tested
        # chunk geometry so the floor stays a few hundred KB
        m_ext = _conv(rows_e[~is_int], cols_e[~is_int], vals[~is_int],
                      ct=(16 if is_dd else 32),
                      row_degrees=deg_full, lane_capacity=cap)
        if not np.array_equal(np.asarray(m_int.lane_of_row),
                              np.asarray(m_ext.lane_of_row)):
            raise ValueError(
                "interior/exterior lane maps diverged despite pinned "
                "degrees — lane_capacity determinism broken")
        mats.append((m_int, m_ext))
    return mats, send_idx, chunk, K, halo_counts


def _stack_side(mats, gh: int, ct: int, wsel: int, is_dd: bool, ng_c: int):
    """Pad one slab family (interior OR exterior) to common shapes and
    stack it with a leading shard axis.  ``ng_c`` (the common output-
    group count) is passed in so both families agree on the kernel
    output length ``ng_c * gh * 128``.  Returns ``(leaves, tiles_c)``.

    tiles_c reserves a chunk per MISSING group id: a group with no
    chunk is never visited by the kernel grid and its output block
    would stay uninitialized on a real TPU (CPU interpret zero-fills
    and hides it)."""
    tiles_c = max(m.num_tiles + (ng_c - m.num_groups) * ct for m in mats)
    tiles_c = round_up(max(tiles_c, ct), ct)
    # empty shards convert without a superpage table — treat the
    # partition as scattered if ANY shard is (zeros elsewhere)
    scat = any(m.group_bases is not None for m in mats)
    lg_c = (max(m.group_bases.shape[0] for m in mats
                if m.group_bases is not None) if scat else 0)

    def pad2(a, rows, fill=0):
        a = np.asarray(a)
        if a.shape[0] == rows:
            return a
        extra = np.full((rows - a.shape[0],) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, extra])

    leaves = dict(values=[], residue=[], page_tab=[], seg_lo=[], seg_hi=[],
                  tile_base=[], chunk_group=[], lane_of_row=[],
                  group_bases=[], values_lo=[])
    for m in mats:
        if (m.group_hacks, m.chunk_tiles, m.window_pages) != (gh, ct, wsel):
            # unconditional (assert would strip under -O and silently
            # stack mixed layout conventions — the corruption class
            # _pad_stack_whell already guards against)
            raise ValueError(
                "shard layout geometry diverged: "
                f"{(m.group_hacks, m.chunk_tiles, m.window_pages)} != "
                f"{(gh, ct, wsel)}")
        leaves["values"].append(pad2(m.values, tiles_c * 8))
        leaves["residue"].append(pad2(m.residue, tiles_c * 8))
        leaves["page_tab"].append(pad2(m.page_tab, tiles_c * 8))
        if is_dd:
            leaves["values_lo"].append(pad2(m.values_lo, tiles_c * 8))
        leaves["seg_lo"].append(pad2(m.seg_lo, ng_c * gh, fill=-1))
        leaves["seg_hi"].append(pad2(m.seg_hi, ng_c * gh, fill=-1))
        leaves["tile_base"].append(pad2(m.tile_base, tiles_c))
        # chunk_group: drop the trailing -1 sentinel; padding chunks
        # first repeat the last real group id (they accumulate zeros and
        # defer that group's single flush), then visit each MISSING
        # group id once so its output block gets written (zeros via the
        # -1 seg masks); re-append the sentinel
        cg = np.asarray(m.chunk_group)[:-1]
        want = tiles_c // ct
        missing = np.arange(m.num_groups, ng_c, dtype=cg.dtype)
        n_pad = want - cg.shape[0]
        if n_pad < missing.size:
            raise ValueError(
                f"chunk padding budget ({n_pad}) cannot cover the "
                f"{missing.size} missing group ids — tiles_c undersized")
        if n_pad:
            cg = np.concatenate([
                cg, np.full(n_pad - missing.size, cg[-1], cg.dtype),
                missing])
        leaves["chunk_group"].append(np.concatenate(
            [cg, np.full(1, -1, cg.dtype)]))
        leaves["lane_of_row"].append(np.asarray(m.lane_of_row))
        if scat:
            gb = (np.zeros(0, np.int32) if m.group_bases is None
                  else np.asarray(m.group_bases))
            leaves["group_bases"].append(pad2(gb, lg_c))
    return leaves, tiles_c


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ComplexPackedPartition:
    """Row-partitioned COMPLEX square matrix as a plane pair: two real
    :class:`PackedPartition`s (re, im) sharing one deterministic halo
    plan and lane space (the planes have identical sparsity patterns,
    so the converters produce identical layouts).  The distributed SpMV
    runs the four real plane products per shard; state vectors are
    ``(S, 2, L)`` [re, im] lane-space stacks (Z / complex128: planes
    are double-float, state ``(S, 2, 2, L)``).  C/Z coverage of the
    mesh path — the reference ships C/Z unconditionally
    (``hdia_zspmv.cu``, ``zdot.cu``)."""

    ar: PackedPartition
    ai: PackedPartition

    @property
    def is_dd(self) -> bool:
        return self.ar.is_dd

    @property
    def n_rows(self) -> int:
        return self.ar.n_rows

    @property
    def n_shards(self) -> int:
        return self.ar.n_shards

    @property
    def n_lane(self) -> int:
        return self.ar.n_lane

    @property
    def chunk(self) -> int:
        return self.ar.chunk

    @property
    def overlapped(self) -> bool:
        return self.ar.overlapped

    def embed(self, x) -> np.ndarray:
        """Complex global ``(n,)`` → ``(S, 2, L)`` [re, im] stacks
        (Z: ``(S, 2, 2, L)`` [re, im] × [hi, lo])."""
        x = np.asarray(x)
        re = self.ar.embed(np.real(x).astype(
            np.float64 if self.is_dd else np.float32))
        im = self.ai.embed(np.imag(x).astype(
            np.float64 if self.is_dd else np.float32))
        return np.stack([re, im], axis=1)

    def extract(self, z) -> np.ndarray:
        z = np.asarray(z)
        re = self.ar.extract(z[:, 0])
        im = self.ai.extract(z[:, 1])
        return re + 1j * im


def partition_coo_rows_packed(
    coo: CooMatrix,
    n_shards: int,
    overlap: bool = True,
) -> PackedPartition:
    """Build a :class:`PackedPartition` from a square host COO
    (complex values: a :class:`ComplexPackedPartition` plane pair).

    ``overlap=True`` (default) splits each shard into interior/exterior
    slabs sharing one lane space, so the distributed SpMV overlaps the
    halo all-to-all with the interior product (VERDICT r3 missing #1 —
    the analogue of the reference's interior/boundary OELL reorder,
    ``ell.c:161-202``).  ``overlap=False`` keeps the single-slab
    schedule (collective serialises with all local compute)."""
    import jax.numpy as jnp

    if np.issubdtype(np.dtype(coo.values.dtype), np.complexfloating):
        real_dt = (np.float64 if coo.values.dtype == np.complex128
                   else np.float32)
        re = CooMatrix(coo.rows, coo.cols,
                       np.real(coo.values).astype(real_dt),
                       coo.n_rows, coo.n_cols)
        im = CooMatrix(coo.rows, coo.cols,
                       np.imag(coo.values).astype(real_dt),
                       coo.n_rows, coo.n_cols)
        ar = partition_coo_rows_packed(re, n_shards, overlap)
        ai = partition_coo_rows_packed(im, n_shards, overlap)
        if not np.array_equal(np.asarray(ar.lane_of_row),
                              np.asarray(ai.lane_of_row)):
            raise ValueError("re/im plane lane maps diverged — plane "
                             "sparsity patterns must be identical")
        return ComplexPackedPartition(ar=ar, ai=ai)

    mats, send_idx, chunk, K, halo_counts = build_shard_mats(
        coo, n_shards, split_exterior=overlap)
    n = coo.n_rows
    mats_int = [m[0] for m in mats] if overlap else mats
    mats_ext = [m[1] for m in mats] if overlap else None
    n_shards = len(mats_int)
    gh, ct = mats_int[0].group_hacks, mats_int[0].chunk_tiles
    is_dd = mats_int[0].is_dd
    wsel = mats_int[0].window_pages

    # common output-group count across shards AND slab families (the
    # kernel output length must agree so products sum directly)
    ng_c = max(m.num_groups for m in mats_int)
    if overlap:
        ng_c = max(ng_c, max(m.num_groups for m in mats_ext))
    xp_c = max(m.x_pages for m in mats_int)

    leaves, tiles_c = _stack_side(mats_int, gh, ct, wsel, is_dd, ng_c)
    ext_st = {}
    ext_tiles_c = 0
    ct_ext = mats_ext[0].chunk_tiles if overlap else 0
    if overlap:
        eleaves, ext_tiles_c = _stack_side(mats_ext, gh, ct_ext, wsel,
                                           is_dd, ng_c)
        ext_st = {k: (jnp.asarray(np.stack(v)) if v else None)
                  for k, v in eleaves.items()}

    lor_st = np.stack(leaves["lane_of_row"])
    send_lane = np.zeros((n_shards, n_shards, K), np.int32)
    for p in range(n_shards):
        send_lane[p] = lor_st[p, send_idx[p]]
    halo_lanes = lor_st[:, chunk:]

    # ragged per-offset exchange plan (r5): one ppermute per live ring
    # offset at that offset's own width; zero-width pairs omitted from
    # the perm entirely, so the bytes on the wire track the REAL halo
    # instead of S*S*K_global (measured waste 75-94% on banded
    # partitions at 2-8 shards — BASELINE.md r4 weak-scaling row)
    halo_send_off, halo_recv_off, halo_offsets = [], [], []
    S = n_shards
    # per-shard INERT phantom positions: slots of pairs beyond their
    # real halo count — no matrix entry ever reads them.  Shards that do
    # NOT participate in a bucket's perm still receive the ppermute's
    # zero-fill and still execute the scatter (SPMD), so their targets
    # must point here, not at a default index (lane 0 is a REAL column
    # lane — scattering the zero-fill there silently corrupted x for
    # overlap=False partitions; caught by review + CPU-mesh repro).
    # Every shard has >= K inert slots: its self-pair (s, s) is always
    # empty (own columns are never halo).
    free_pos = [np.array([p * K + i for p in range(S)
                          for i in range(halo_counts[p][s], K)],
                         np.int64)
                for s in range(S)]
    for o in range(1, S):
        pairs = [(p, (p + o) % S, halo_counts[p][(p + o) % S])
                 for p in range(S)]
        pairs = [t for t in pairs if t[2] > 0]
        if not pairs:
            continue
        # sub-bucket the offset's pairs by width so every ppermute
        # carries near-exact widths (within-bucket max/min <= 4/3 ->
        # per-bucket padding waste <= 25% even on ragged-width
        # partitions; one live offset with widths spanning 10x costs a
        # handful of buckets, not S*K_global padding)
        pairs.sort(key=lambda t: -t[2])
        i = 0
        while i < len(pairs):
            wmax = pairs[i][2]
            bucket = [pairs[i]]
            i += 1
            while i < len(pairs) and pairs[i][2] >= 0.75 * wmax:
                bucket.append(pairs[i])
                i += 1
            Ko = round_up(wmax, 8)  # <= K by construction
            snd = np.zeros((S, Ko), np.int32)
            rcv = np.zeros((S, Ko), np.int32)
            # default every shard's targets to its inert slots (zeros
            # land harmlessly); participants overwrite with the pair's
            # real phantom region below
            for s in range(S):
                rcv[s] = halo_lanes[s, free_pos[s][:Ko]]
            perm = []
            for p, s, c in bucket:
                snd[p, :c] = send_lane[p, s, :c]
                # requester-side scatter targets: the pair's phantom
                # slots; padding (c..Ko) lands in the pair's UNUSED
                # phantom lanes — no matrix entry reads them, so the
                # junk x is inert (the legacy all_to_all wrote all S*K
                # slots the same way)
                rcv[s] = halo_lanes[s, p * K + np.arange(Ko)]
                perm.append((p, s))
            halo_send_off.append(jnp.asarray(snd))
            halo_recv_off.append(jnp.asarray(rcv))
            halo_offsets.append((o, tuple(perm)))

    st = {k: (jnp.asarray(np.stack(v)) if v else None)
          for k, v in leaves.items()}
    return PackedPartition(
        values=st["values"], residue=st["residue"], page_tab=st["page_tab"],
        seg_lo=st["seg_lo"], seg_hi=st["seg_hi"], tile_base=st["tile_base"],
        chunk_group=st["chunk_group"], lane_of_row=jnp.asarray(lor_st),
        send_lane_idx=jnp.asarray(send_lane),
        halo_lanes=jnp.asarray(halo_lanes),
        group_bases=st["group_bases"], values_lo=st["values_lo"],
        ext_values=ext_st.get("values"), ext_residue=ext_st.get("residue"),
        ext_page_tab=ext_st.get("page_tab"),
        ext_tile_base=ext_st.get("tile_base"),
        ext_chunk_group=ext_st.get("chunk_group"),
        ext_group_bases=ext_st.get("group_bases"),
        ext_values_lo=ext_st.get("values_lo"),
        n_rows=n, n_shards=n_shards, chunk=chunk, halo_width=K,
        nnz=coo.nnz, num_hacks=mats_int[0].num_hacks, num_groups=ng_c,
        total_slots=tiles_c * 8, x_pages=xp_c, window_pages=wsel,
        group_hacks=gh, chunk_tiles=ct, ext_total_slots=ext_tiles_c * 8,
        ext_chunk_tiles=ct_ext, halo_counts=halo_counts,
        halo_send_off=tuple(halo_send_off),
        halo_recv_off=tuple(halo_recv_off),
        halo_offsets=tuple(halo_offsets),
        unit_segments=all(m.unit_segments for m in mats_int)
        and (not overlap or all(m.unit_segments for m in mats_ext)),
    )
