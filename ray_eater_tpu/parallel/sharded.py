"""Multi-chip rendering via jax.sharding Mesh + shard_map.

The reference is strictly single-GPU (SURVEY.md §2.5); this module is the
framework's scale-out path, designed around ICI collectives rather than any
host-side networking:

* **Splat-parallel projection** ("tensor-parallel" flavor): the splat cloud
  is sharded across devices, each projects its shard, and the projected
  records are `all_gather`ed over the mesh (one ICI ring pass) — projection
  FLOPs scale 1/D.
* **Tile-parallel compositing/raster** ("data/spatial-parallel" flavor): the
  framebuffer is sharded into row bands, each device bins + composites only
  splats intersecting its band. No communication after the gather — tile
  work is embarrassingly parallel.

The same recipe shards the triangle raster path (row-band framebuffer,
replicated geometry). All functions run unmodified on a virtual CPU mesh
(tests) and a real TPU slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.resources import Framebuffer
from ..models.mesh import Mesh as GeoMesh
from ..ops import gs as gs_ops
from ..utils import pad_to as _pad_to

def make_device_mesh(n_devices: int | None = None,
                     axis: str = "d") -> Mesh:
    """1-D device mesh over the first n devices (default: all)."""
    n = n_devices or len(jax.devices())
    return jax.make_mesh((n,), (axis,))


def _ring_compact(packet, keep_fn, budget: int, axis: str, d: int):
    """Ring exchange with budgeted compaction (shared by the row-band and
    depth-sliced renderers): the (n/d, C) shard packets circulate the ICI
    ring d-1 hops via ``ppermute``; at each visit this device compacts
    the rows ``keep_fn(pkt)`` selects into a fixed ``budget``-row buffer
    (scatter-free SORT-compaction append — one unstable key-only sort of
    where(keep, iota, nd), the gs._compact_channel pattern; the former
    cumsum+searchsorted form rides the per-query-binary-search gather
    wall at ~24x the cost at these slot counts, tools/exp_compact.py).
    The d-th shard is the one already in hand after the last
    hop, so no trailing ppermute is paid. Rows beyond the budget are
    dropped whole and counted. Returns (buffer, count, overflow)."""
    nd = packet.shape[0]
    slot = jnp.arange(budget, dtype=jnp.int32)
    perm = [(i, (i + 1) % d) for i in range(d)]
    iota = jnp.arange(nd, dtype=jnp.int32)

    def compact(pkt, buf, cnt, ov):
        ok = keep_fn(pkt)
        key = jnp.where(ok, iota, jnp.int32(nd))
        (skey,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
        k = jnp.sum(ok.astype(jnp.int32))
        head = jnp.minimum(skey, nd - 1)
        head = (head[:budget] if budget <= nd else jnp.concatenate(
            [head, jnp.full(budget - nd, nd - 1, jnp.int32)]))
        # append at offset cnt: slot s >= cnt reads kept row (s - cnt) —
        # a cyclic roll of the compacted id vector (wrapped slots < cnt
        # are masked off by ``put`` below)
        src = jnp.roll(head, cnt)
        rows = jnp.take(pkt, src, axis=0)
        put = (slot >= cnt) & (slot < cnt + k)
        buf = jnp.where(put[:, None], rows, buf)
        ov = ov + jnp.maximum(cnt + k - budget, 0)
        cnt = jnp.minimum(cnt + k, budget)
        return buf, cnt, ov

    def step(_, carry):
        pkt, buf, cnt, ov = carry
        buf, cnt, ov = compact(pkt, buf, cnt, ov)
        return (jax.lax.ppermute(pkt, axis, perm), buf, cnt, ov)

    z = jnp.zeros((), jnp.int32)
    pkt, buf, cnt, ov = jax.lax.fori_loop(
        0, d - 1, step,
        (packet, jnp.zeros((budget, packet.shape[1]), packet.dtype),
         z, z))
    return compact(pkt, buf, cnt, ov)


def render_gaussians_sharded(cloud, view, proj, width: int, height: int,
                             mesh: Mesh, background=(0.0, 0.0, 0.0),
                             cam_pos=None, ky: int | None = None,
                             max_splats_per_tile: int | None = None,
                             big_splat_cap: int | None = None,
                             mid_splat_cap: int | None = None,
                             mid_lo_splat_cap: int | None = None,
                             corner_cap: int | None = None,
                             lod_budget=None,
                             lod_tail: bool = False,
                             lod_tail_decim: int | None = None,
                             lod_tail_d: int | None = None,
                             return_stats: bool = False,
                             interpret: bool = False,
                             tile_w: int | None = None,
                             splat_exchange: str = "all_gather",
                             ring_budget: int | None = None,
                             exact_seg: int = 4,
                             lod_seg: int = 1
                             ) -> jnp.ndarray:
    """Sharded GaussianCloud render → (height, width, 3) on the mesh.
    Feature parity with :func:`ray_eater_tpu.ops.gs.render_gaussians`:
    ``cam_pos`` enables view-dependent SH colors, ``ky`` the span/radius
    knob, ``max_splats_per_tile`` the per-tile LOD cap, ``big_splat_cap``
    the two-level large-splat budget, ``lod_budget`` the (ntiles,)
    temporal adaptive-LOD desire (full-grid tile order: feed
    ``update_lod_budget`` of the previous frame's ``tile_exec`` — both
    ends of that loop are full-grid arrays, sharded/unsharded here by
    tile row), ``lod_tail`` the dropped-energy slab, ``return_stats`` the
    overflow/telemetry dict, and ``tile_w`` the footprint-tight composite
    tile width (see ops.gs.render_gaussians).

    One semantic nuance vs single-device: the tail slab's per-splat
    energy split divides by the splat's pair count WITHIN the band, so a
    band-crossing dropped splat weighs slightly more than single-device
    (the slab is an approximation either way; parity tests bound the
    difference on whole images).

    Splats must be divisible by mesh size (pad the cloud if needed); the
    framebuffer row-band split requires padded height divisible by
    D*TILE_H.

    ``splat_exchange`` selects how projected records reach the devices
    whose row bands need them:

    * ``"all_gather"`` (default): ONE tiled ICI all_gather replicates
      the (N, 16) packet table — minimal latency, but every device
      holds all N records (the HBM wall at 10M+ splats).
    * ``"ring"``: the (N/D, 16) shard packets circulate the ICI ring
      D-1 hops (``ppermute``); each device compacts only the splats
      whose footprint touches its band into a fixed ``ring_budget``-row
      buffer (scatter-free cumsum+searchsorted compaction, the
      big-splat-channel pattern). Same total ICI traffic as the
      all_gather, but peak memory is N/D + ring_budget rows. Splats
      beyond the budget are dropped whole and counted in
      ``overflow_big_splats``. ``ring_budget`` defaults to 2·N/D —
      generous for D≥4 bands whose in-band fraction is ~1/D plus the
      apron.
    """
    if ky is None:
        ky = gs_ops.KY
    if tile_w is None:
        tile_w = gs_ops.TILE_W
    axis = mesh.axis_names[0]
    d = mesh.shape[axis]
    nty_total = _pad_to(height, gs_ops.TILE_H) // gs_ops.TILE_H
    nty_total = _pad_to(nty_total, d)
    nty_local = nty_total // d
    band_px = nty_local * gs_ops.TILE_H
    ntx = _pad_to(width, tile_w) // tile_w
    n = cloud.num_splats
    if n % d:
        raise ValueError(f"splat count {n} not divisible by mesh size {d}")

    if splat_exchange not in ("all_gather", "ring"):
        raise ValueError(f"unknown splat_exchange {splat_exchange!r}")
    ring = splat_exchange == "ring"
    if ring:
        ring_budget = ring_budget or 2 * (n // d)
    # emission sees N gathered rows (all_gather) or ring_budget
    # compacted rows (ring)
    n_rows = ring_budget if ring else n
    # (max_splats_per_tile sizes its own compact pack layout inside
    # _bin_splats; cap_pairs only governs the exact/direct mode)
    if corner_cap is not None and ky == gs_ops.KY == 2:
        cap_pairs = (n_rows * 2 + corner_cap * gs_ops.KX * ky
                     + nty_local * ntx * gs_ops.CHUNK)
    else:
        cap_pairs = n_rows * gs_ops.KX * ky + nty_local * ntx * gs_ops.CHUNK
    if big_splat_cap is not None:
        cap_pairs += big_splat_cap * gs_ops._kx2(tile_w) * gs_ops.KY2
        if mid_splat_cap is not None:
            cap_pairs += mid_splat_cap * gs_ops._kxm(tile_w) * gs_ops.KY_M
            if mid_lo_splat_cap is not None:
                cap_pairs += (mid_lo_splat_cap * gs_ops._kxml(tile_w)
                              * gs_ops.KY_ML)
    # multi-chunk composite grid steps (ops.gs.render_gaussians
    # exact_seg / lod_seg semantics)
    nseg = (exact_seg if max_splats_per_tile is None
            else max(lod_seg, 1))
    cap_pairs = _pad_to(cap_pairs, gs_ops.CHUNK * nseg)
    max_radius = (float(gs_ops.level2_max_radius(tile_w))
                  if big_splat_cap is not None else None)

    def local_render(means, scales, quats, opac, colors, sh_rest,
                     budget_local):
        # --- splat-parallel projection + gather (one ICI all_gather of the
        # packed record matrix) ---
        if cam_pos is not None and sh_rest is not None:
            from ..models.gaussians import GaussianCloud, eval_sh_colors
            colors = eval_sh_colors(
                GaussianCloud(means=means, scales=scales, quats=quats,
                              opacities=opac, colors=colors,
                              sh_rest=sh_rest), cam_pos)
        ps_local = gs_ops.project_gaussians(means, scales, quats, opac,
                                            colors, view, proj,
                                            width, height, ky=ky,
                                            max_radius=max_radius)
        rec_local = gs_ops._make_records(ps_local)          # (n/d, 12)
        # binning columns (radius/depth/valid/per-axis extents) ride the
        # same all_gather as the kernel record table: one (n/d, 17) ICI
        # collective
        aux = jnp.stack([ps_local.radius.astype(jnp.float32),
                         jnp.where(jnp.isfinite(ps_local.depth),
                                   ps_local.depth, jnp.inf),
                         jnp.isfinite(ps_local.depth).astype(jnp.float32),
                         ps_local.ext[:, 0].astype(jnp.float32),
                         ps_local.ext[:, 1].astype(jnp.float32)], -1)
        packet = jnp.concatenate([rec_local, aux], -1)      # (n/d, 17)
        band = jax.lax.axis_index(axis)
        y0 = (band * band_px).astype(jnp.float32)
        ov_ring = jnp.zeros((), jnp.int32)
        if ring:
            # RING EXCHANGE (see docstring): compact the band-touching
            # splats of every visiting shard into a ring_budget buffer
            def keep_band(pkt):
                my_ = pkt[:, gs_ops._MY]
                ry_ = pkt[:, gs_ops._ROWS + 4]   # vertical bbox extent
                return ((pkt[:, gs_ops._ROWS + 2] > 0.5)
                        & (my_ + ry_ > y0) & (my_ - ry_ < y0 + band_px))

            packet, _, ov_ring = _ring_compact(packet, keep_band,
                                               ring_budget, axis, d)
            # dead slots (>= cnt) are all-zero rows: valid column 0
        else:
            packet = jax.lax.all_gather(packet, axis, axis=0, tiled=True)
        records, rad = packet[:, :gs_ops._ROWS], packet[:, gs_ops._ROWS]
        depth, valid = packet[:, gs_ops._ROWS + 1], packet[
            :, gs_ops._ROWS + 2] > 0.5
        ext = packet[:, gs_ops._ROWS + 3:gs_ops._ROWS + 5]

        # --- tile-parallel composite: this device's row band ---
        my = records[:, gs_ops._MY]
        ry_v = ext[:, 1]
        in_band = (my + ry_v > y0) & (my - ry_v < y0 + band_px)
        records = records.at[:, gs_ops._MY].add(-y0)

        tail_in = None
        if max_splats_per_tile is not None and lod_tail:
            # per-splat total alpha integral from the gathered records
            # (conic + opacity + colors), matching render_gaussians
            detc = jnp.maximum(
                records[:, gs_ops._CA] * records[:, gs_ops._CC]
                - records[:, gs_ops._CB] ** 2, 1e-12)
            a_full = (records[:, gs_ops._OP] * (2.0 * jnp.pi)
                      * jax.lax.rsqrt(detc))
            tail_in = (a_full, records[:, gs_ops._CR:gs_ops._CB2 + 1])

        (pack_idx, steps, visited, overflow, overflow_big, tail_slab,
         lod_kc, bin_tail) = gs_ops._bin_splats(records[:, gs_ops._MX],
                               records[:, gs_ops._MY], rad,
                               valid & in_band, depth,
                               ntx, nty_local, cap_pairs, ky=ky,
                               max_per_tile=max_splats_per_tile,
                               big_cap=big_splat_cap,
                               mid_cap=mid_splat_cap,
                               mid_lo_cap=mid_lo_splat_cap,
                               corner_cap=corner_cap,
                               budget=(budget_local if lod_budget
                                       is not None else None),
                               tail=tail_in, tile_w=tile_w,
                               records=(records if max_splats_per_tile
                                        is None else None),
                               nseg=nseg, ext=ext,
                               tail_decim=lod_tail_decim)
        # exact mode: payload-sort returned the packed array directly
        packed = (pack_idx if max_splats_per_tile is None
                  else gs_ops._pack_records(records, pack_idx))
        r_, g_, b_, t_, texec = gs_ops._composite_call(
            packed, steps, nty_local, ntx, interpret, tile_w, nseg=nseg)
        tail_planes = None
        if bin_tail is not None:
            # DECIMATED-TAIL composite over this band (ops.gs
            # render_gaussians semantics: second pool extends each
            # tile's sorted prefix at 1/d² pixel cost)
            td_f = (gs_ops._TAIL_D if lod_tail_d is None else lod_tail_d)
            pack_tl, steps_tl, kept_tl = bin_tail
            packed_tl = gs_ops._pack_records(records, pack_tl)
            vis_h = jnp.concatenate(
                [visited, jnp.zeros((1,), bool)])[:, None, None]
            td = gs_ops._decimate_t(jnp.where(vis_h, t_, 1.0), tile_w,
                                    td_f)
            rt, gt, bt, tt = gs_ops._composite_tail_call(
                packed_tl, steps_tl, td, nty_local, ntx, interpret,
                tile_w, decim=td_f, nseg=gs_ops._TAIL_SEG)
            tail_planes = (rt, gt, bt, tt, td, kept_tl > 0)
        img = gs_ops.finalize_planes(
            r_, g_, b_, t_, visited, nty_local, ntx, background,
            tail_slab=tail_slab, tile_w=tile_w,
            tail_decim_planes=tail_planes,
            decim=(gs_ops._TAIL_D if lod_tail_d is None
                   else lod_tail_d))  # (band_px, Wp, 3)
        tile_exec = jnp.where(visited, texec[:-1, 0, 0], 0)
        # per-band saturation certificate (ops.gs.render_gaussians
        # semantics; whole-frame flag = AND over bands outside)
        ovb_all = overflow_big + ov_ring
        if max_splats_per_tile is not None:
            kept_, count_ = lod_kc
            dry = ((kept_ < count_) & (tile_exec >= kept_)
                   & (count_ > 0))
            cert = (~jnp.any(dry)) & (ovb_all == 0)
        else:
            cert = (overflow == 0) & (ovb_all == 0)
        return (img, overflow[None], ovb_all[None],
                tile_exec, lod_kc[0], lod_kc[1], cert[None])

    spec_splat = P(axis)
    sh = getattr(cloud, "sh_rest", None)
    budget = lod_budget
    if budget is not None:
        # full-grid (ntiles,) desire, band rows padded to the grid the
        # render actually uses (update_lod_budget output is full-grid)
        budget = jnp.asarray(budget, jnp.int32)
        full = nty_total * ntx
        if budget.shape[0] < full:
            pad_rows = full - budget.shape[0]
            budget = jnp.concatenate(
                [budget, jnp.zeros((pad_rows, *budget.shape[1:]),
                                   jnp.int32)])
    (out, overflow, overflow_big, tile_exec, tile_kept, tile_count,
     cert) = jax.shard_map(
            local_render, mesh=mesh,
            in_specs=(spec_splat,) * 5
            + ((spec_splat,) if sh is not None else (P(),))
            + ((P(axis),) if budget is not None else (P(),)),
            out_specs=(P(axis, None, None), P(axis), P(axis), P(axis),
                       P(axis), P(axis), P(axis)),
            check_vma=False,
        )(cloud.means, cloud.scales, cloud.quats, cloud.opacities,
          cloud.colors, sh,
          budget if budget is not None else jnp.zeros((d,), jnp.int32))
    # replicate before the crop: slicing a row-band-sharded image to the
    # unpadded height is sharding-ambiguous when bands don't divide it
    out = jax.device_put(out, jax.sharding.NamedSharding(mesh, P()))
    img = out[:height, :width]
    if return_stats:
        # telemetry replicated: consumers (update_lod_budget's 3x3 pool)
        # slice across the band boundary, which a row-band-sharded array
        # can't express
        rep = lambda a: jax.device_put(
            a, jax.sharding.NamedSharding(mesh, P()))
        return img, {"overflow_pairs": jnp.sum(overflow),
                     "overflow_big_splats": jnp.sum(overflow_big),
                     "lossless": jnp.all(cert),
                     "tile_exec": rep(tile_exec),
                     "tile_kept": rep(tile_kept),
                     "tile_count": rep(tile_count)}
    return img


def render_gaussians_depth_sliced(cloud, view, proj, width: int,
                                  height: int, mesh: Mesh,
                                  background=(0.0, 0.0, 0.0),
                                  cam_pos=None, ky: int | None = None,
                                  tile_w: int | None = None,
                                  slice_budget: int | None = None,
                                  big_splat_cap: int | None = None,
                                  return_stats: bool = False,
                                  interpret: bool = False) -> jnp.ndarray:
    """SORT-LAST parallel 3DGS: each device owns a DEPTH SLICE.

    :func:`render_gaussians_sharded` is sort-first — every device needs
    every record touching its row band, so records are replicated
    (all_gather) or ring-compacted. This is the classic sort-last
    decomposition of parallel volume rendering (binary-swap / radix-k
    lineage): alpha compositing over depth-DISJOINT splat sets is
    associative,

        (C_a, T_a) (+) (C_b, T_b) = (C_a + T_a*C_b, T_a*T_b),

    so each device composites the FULL frame over only the splats whose
    view depth falls in its global depth quantile (N/D records after one
    ring redistribution — D× less ICI record traffic than the
    all_gather, and nothing replicated), then the D premultiplied
    (color, transmittance) image pairs fold front-to-back. Projection,
    binning sort, and composite list depth all scale 1/D; the per-device
    tile grid is the full frame.

    Depth slices are QUANTILES from one psum'd 256-bin histogram of
    valid record depths, recomputed per frame (bin-granular splits).
    Records route to their slice owner over the ppermute ring with
    per-hop compaction into a ``slice_budget``-row buffer (default
    2·N/D); overflowing records are dropped whole and counted in
    ``overflow_big_splats``. Compositing is the exact payload-sort path
    (per-tile LOD budgets are a per-device-list concept; slices are
    already 1/D deep)."""
    if ky is None:
        ky = gs_ops.KY
    if tile_w is None:
        tile_w = gs_ops.TILE_W
    axis = mesh.axis_names[0]
    d = mesh.shape[axis]
    nty = _pad_to(height, gs_ops.TILE_H) // gs_ops.TILE_H
    ntx = _pad_to(width, tile_w) // tile_w
    n = cloud.num_splats
    if n % d:
        raise ValueError(f"splat count {n} not divisible by mesh size {d}")
    nd = n // d
    budget = slice_budget or 2 * nd
    cap_pairs = _pad_to(budget * gs_ops.KX * ky
                        + nty * ntx * gs_ops.CHUNK
                        + (big_splat_cap * gs_ops._kx2(tile_w) * gs_ops.KY2
                           if big_splat_cap else 0), gs_ops.CHUNK)
    max_radius = (float(gs_ops.level2_max_radius(tile_w))
                  if big_splat_cap is not None else None)
    nbins = 256

    def local_render(means, scales, quats, opac, colors, sh_rest):
        if cam_pos is not None and sh_rest is not None:
            from ..models.gaussians import GaussianCloud, eval_sh_colors
            colors = eval_sh_colors(
                GaussianCloud(means=means, scales=scales, quats=quats,
                              opacities=opac, colors=colors,
                              sh_rest=sh_rest), cam_pos)
        ps = gs_ops.project_gaussians(means, scales, quats, opac, colors,
                                      view, proj, width, height, ky=ky,
                                      max_radius=max_radius)
        rec = gs_ops._make_records(ps)                       # (n/d, 12)
        valid_l = jnp.isfinite(ps.depth)
        aux = jnp.stack([ps.radius.astype(jnp.float32),
                         jnp.where(valid_l, ps.depth, jnp.inf),
                         valid_l.astype(jnp.float32),
                         ps.ext[:, 0].astype(jnp.float32),
                         ps.ext[:, 1].astype(jnp.float32)], -1)
        packet = jnp.concatenate([rec, aux], -1)             # (n/d, 17)

        # --- global depth quantiles: one psum'd histogram ---
        dpth = packet[:, gs_ops._ROWS + 1]
        vmask = packet[:, gs_ops._ROWS + 2] > 0.5
        big = jnp.float32(3.4e38)
        dmin = -jax.lax.pmax(jnp.max(jnp.where(vmask, -dpth, -big)), axis)
        dmax = jax.lax.pmax(jnp.max(jnp.where(vmask, dpth, -big)), axis)
        span = jnp.maximum(dmax - dmin, 1e-9)
        hist = jnp.zeros((nbins,), jnp.float32).at[
            jnp.clip(((dpth - dmin) / span * nbins).astype(jnp.int32),
                     0, nbins - 1)].add(vmask.astype(jnp.float32))
        hist = jax.lax.psum(hist, axis)
        ce = jnp.concatenate([jnp.zeros(1, jnp.float32),
                              jnp.cumsum(hist)])             # exclusive
        total = jnp.maximum(ce[-1], 1.0)
        # whole bins map to one device by cumulative START fraction, so
        # the slice sets are depth-disjoint by construction
        bin_dev = jnp.minimum((ce[:-1] * d / total).astype(jnp.int32),
                              d - 1)                         # (nbins,)
        me = jax.lax.axis_index(axis)

        def target_of(pkt):
            dp = pkt[:, gs_ops._ROWS + 1]
            ok = pkt[:, gs_ops._ROWS + 2] > 0.5
            b = jnp.clip(((dp - dmin) / span * nbins).astype(jnp.int32),
                         0, nbins - 1)
            return jnp.where(ok, jnp.take(bin_dev, b), -1)

        # --- ring redistribution into this device's slice buffer ---
        sl, _, ov_ring = _ring_compact(
            packet, lambda pkt: target_of(pkt) == me, budget, axis, d)

        # --- full-frame exact composite of this slice ---
        records = sl[:, :gs_ops._ROWS]
        rad = sl[:, gs_ops._ROWS]
        depth = sl[:, gs_ops._ROWS + 1]
        valid = sl[:, gs_ops._ROWS + 2] > 0.5
        (packed, steps, visited, overflow, overflow_big, _,
         _, _) = gs_ops._bin_splats(
            records[:, gs_ops._MX], records[:, gs_ops._MY], rad, valid,
            depth, ntx, nty, cap_pairs, ky=ky, tile_w=tile_w,
            big_cap=big_splat_cap, records=records,
            ext=sl[:, gs_ops._ROWS + 3:gs_ops._ROWS + 5])
        r_, g_, b_, t_, _ = gs_ops._composite_call(
            packed, steps, nty, ntx, interpret, tile_w)
        # background-free planes: C premultiplied, T transmittance —
        # exactly the (+) operands (finalize_planes would blend bg)
        vis = jnp.concatenate([visited, jnp.zeros((1,), bool)]
                              )[:, None, None]
        planes = [gs_ops._untile(jnp.where(vis, p, fill), nty, ntx,
                                 tile_w)
                  for p, fill in ((r_, 0.0), (g_, 0.0), (b_, 0.0),
                                  (t_, 1.0))]
        c_img = jnp.stack(planes[:3], -1)                  # (Hp, Wp, 3)
        t_img = planes[3]                                  # (Hp, Wp)

        # --- sort-last combine: fold D slices front-to-back ---
        cs = jax.lax.all_gather(c_img, axis)               # (d, Hp, Wp, 3)
        ts = jax.lax.all_gather(t_img, axis)

        def fold(i, carry):
            c, t = carry
            return c + t[..., None] * cs[i], t * ts[i]

        c, t = jax.lax.fori_loop(
            0, d, fold, (jnp.zeros_like(c_img), jnp.ones_like(t_img)))
        bg = jnp.asarray(background, jnp.float32)
        img = c + t[..., None] * bg
        return img, overflow[None], (overflow_big + ov_ring)[None]

    sh = getattr(cloud, "sh_rest", None)
    img, ovp, ovb = jax.shard_map(
        local_render, mesh=mesh,
        in_specs=(P(axis),) * 5 + ((P(axis),) if sh is not None
                                   else (P(),)),
        out_specs=(P(), P(axis), P(axis)),
        check_vma=False,
    )(cloud.means, cloud.scales, cloud.quats, cloud.opacities,
      cloud.colors, sh)
    img = img[:height, :width]
    if return_stats:
        return img, {"overflow_pairs": jnp.sum(ovp),
                     "overflow_big_splats": jnp.sum(ovb),
                     "lossless": (jnp.sum(ovp) == 0)
                     & (jnp.sum(ovb) == 0)}
    return img


def render_mesh_sharded(pipe, geo: GeoMesh, uniforms, resources,
                        width: int, height: int, mesh: Mesh,
                        clear_color=(0.0, 0.0, 0.0, 1.0),
                        clear_depth: float = 1.0,
                        interpret: bool = False):
    """Row-band-sharded triangle raster: geometry/uniforms replicated, each
    device rasters + shades its band of the framebuffer. Returns
    (color (H,W,4), depth (H,W))."""
    from ..ops import raster as raster_ops

    axis = mesh.axis_names[0]
    d = mesh.shape[axis]
    # bands need only f32-sublane (8-row) alignment: _raster_call pads its
    # own rows to the kernel tile height and slices back, and padding to
    # TILE_H*d here would make the final crop an uneven resharding slice
    hp = _pad_to(height, 8 * d)
    band_px = hp // d
    wp = _pad_to(width, raster_ops.TILE_W)

    def local_render(_token):
        band = jax.lax.axis_index(axis)
        y0 = (band * band_px).astype(jnp.float32)

        clip, varyings = pipe.vertex_fn(geo.positions, geo.attributes,
                                        uniforms)
        # shift screen-space y by the band origin: adjust the viewport
        # inside triangle setup by biasing the plane constants
        setup, inv_w, z_tri, bary_mix = raster_ops._triangle_setup(
            clip, geo.indices, pipe.state, width, height)
        tri_vary = {}
        for name, vals in varyings.items():
            tv = vals[geo.indices]
            tv2 = jnp.concatenate([tv, tv], 0)
            tri_vary[name] = (
                bary_mix[..., 0, None] * tv2[:, 0:1]
                + bary_mix[..., 1, None] * tv2[:, 1:2]
                + bary_mix[..., 2, None] * tv2[:, 2:3])
        # λ(px, py_global) = a·px + b·(py_local + y0) + c  →  c += b·y0
        setup = setup.at[2].add(setup[1] * y0)     # c0 += b0*y0
        setup = setup.at[5].add(setup[4] * y0)     # c1 += b1*y0
        setup = setup.at[8].add(setup[7] * y0)     # cz += bz*y0

        fb_local = Framebuffer(
            color=jnp.broadcast_to(
                jnp.asarray(clear_color, jnp.float32),
                (band_px, wp, 4)).astype(jnp.float32),
            depth=jnp.full((band_px, wp), clear_depth, jnp.float32),
            width=width, height=height)

        state = pipe.state
        last_wins = (not state.depth_test
                     or state.depth_compare.name == "ALWAYS")
        # per-band y scissor is unnecessary: rows past the global height
        # only exist in the last band and are cropped after the concat
        zt = z_tri if (last_wins and state.depth_write) else None
        feat_table = (raster_ops._feature_table(tri_vary, inv_w, zt)
                      if (raster_ops._SHADE_FETCH
                          and inv_w.shape[0] > raster_ops._BIN_MIN_TRIS)
                      else None)
        gdepth, gtri, gl0, gl1, feats = raster_ops._raster_call(
            setup, fb_local.depth, width, band_px,
            depth_test=state.depth_test, last_wins=last_wins,
            interpret=interpret,
            less_equal=state.depth_compare.name == "LESS_EQUAL",
            n_tris=inv_w.shape[0], feat_table=feat_table)
        out_fb = raster_ops._shade(
            pipe, fb_local, gdepth, gtri, gl0, gl1, tri_vary,
            inv_w, resources, z_tri=zt, feats=feats)
        return out_fb.color, out_fb.depth

    token = jnp.zeros((d,), jnp.float32)
    color, depth = jax.shard_map(
        local_render, mesh=mesh,
        in_specs=(P(axis),),
        out_specs=(P(axis, None, None), P(axis, None)),
        check_vma=False,
    )(token)
    return color[:height, :width], depth[:height, :width]
