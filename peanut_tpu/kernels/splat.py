"""Trilinear voxel splatting (scatter-add) — the hot mapping kernel.

Behavioural twin of the reference ``splat_feat_nd``
(/root/reference/nav/agent/utils/depth_utils.py:198-252): each point carries a
feature vector that is distributed over the 2^d corners of its enclosing grid
cell with trilinear weights, accumulated by scatter-add, with the accumulator
rounded to integers after every corner pass (the reference's
``torch.round(grid_flat)`` at depth_utils.py:250 — load-bearing for the
uint8-comparable training maps).

TPU notes: XLA lowers ``.at[...].add`` to a sorted-scatter; with B*nPt ~ 19k
points and 11 feature channels this is VPU-bound but small.  The fast path
(``exact=False``) fuses all corners into one scatter and skips the per-corner
rounding; use it when bit-parity with the reference data format is not needed.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp


def splat_projected_2d(feat, coords, vr: int, nz: int,
                       min_z: int, max_z: int, chunk: int = 1200):
    """Scatter-free voxel splat, pre-collapsed over height bands.

    The mapper only ever consumes the 3D voxel grid through two z-band sums
    (agent-height band and all-height; reference mapping.py:102-106), so the
    z axis can be folded into per-point scalar masses and the xy bilinear
    scatter becomes a dense contraction:

        out[c, y, x] = sum_p feat[c, p] * wz[p] * Wy[p, y] * Wx[p, x]

    where Wy/Wx hold the bilinear hat weights evaluated against a cell iota
    (exactly two nonzeros per point, identical values to the trilinear
    corner weights, with the reference's index-0 exclusion).  This runs as
    chunked MXU matmuls — no scatter, ~2 orders of magnitude faster on TPU
    than the scatter_add formulation.  It skips the reference's per-corner
    integer rounding (use the exact path for bit-comparable maps).

    Args:
      feat: (B, C, P); coords: (B, 3, P) normalized [-1, 1].
    Returns:
      (band_proj, total_proj): each (B, C, vr, vr), with out[..., y, x]
      indexed [y=dim1 cell, x=dim0 cell] matching the exact path's
      ``voxels.transpose(2, 3)`` + band-sum output orientation.
    """
    b, c, p = feat.shape
    f32 = jnp.float32

    pos_x = coords[:, 0, :] * (vr / 2.0) + vr / 2.0      # (B, P)
    pos_y = coords[:, 1, :] * (vr / 2.0) + vr / 2.0
    pos_z = coords[:, 2, :] * (nz / 2.0) + nz / 2.0

    # z mass per point: two hat-weighted bins, index-0 excluded (safe_ix)
    z0 = jnp.floor(pos_z)
    masses = []
    for sel in ("band", "total"):
        m = jnp.zeros_like(pos_z)
        for ix in (0.0, 1.0):
            zi = z0 + ix
            w = (1.0 - jnp.abs(pos_z - zi)) * ((zi > 0) & (zi < nz))
            if sel == "band":
                w = w * ((zi >= min_z) & (zi < max_z))
            m = m + w
        masses.append(m)
    w_band, w_total = masses

    cells = jnp.arange(vr, dtype=f32)
    valid_cell = (cells > 0)                              # index-0 exclusion

    def hat(pos):
        w = 1.0 - jnp.abs(pos[..., None] - cells[None, None, :])
        return jnp.maximum(w, 0.0) * valid_cell[None, None, :]  # (B, P, vr)

    n_chunks = -(-p // chunk)
    pad = n_chunks * chunk - p
    def padp(x, axis):
        cfgp = [(0, 0)] * x.ndim
        cfgp[axis] = (0, pad)
        return jnp.pad(x, cfgp)

    feat_c = padp(feat, 2).reshape(b, c, n_chunks, chunk)
    px_c = padp(pos_x, 1).reshape(b, n_chunks, chunk)
    py_c = padp(pos_y, 1).reshape(b, n_chunks, chunk)
    wb_c = padp(w_band, 1).reshape(b, n_chunks, chunk)
    wt_c = padp(w_total, 1).reshape(b, n_chunks, chunk)

    def body(acc, idx):
        fk = feat_c[:, :, idx]                            # (B, C, K)
        wy = hat(py_c[:, idx])                            # (B, K, vr)
        wx = hat(px_c[:, idx])                            # (B, K, vr)
        outs = []
        for wz in (wb_c[:, idx], wt_c[:, idx]):
            fz = fk * wz[:, None, :]                      # (B, C, K)
            # Z[b, c, x, k] = fz * wx ; out += Z @ wy -> (B, C, x, y)
            zcx = jnp.einsum("bck,bkx->bcxk", fz, wx)
            outs.append(jnp.einsum("bcxk,bky->bcxy", zcx, wy))
        return (acc[0] + outs[0], acc[1] + outs[1]), None

    init = (jnp.zeros((b, c, vr, vr), f32), jnp.zeros((b, c, vr, vr), f32))
    (band, total), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    # orientation: exact path transposes the two spatial dims (x-major ->
    # row=y); 'bcxy' above already has [dim0-cell, dim1-cell] = pre-transpose
    # layout, so swap to match voxels.transpose(2, 3)
    return jnp.swapaxes(band, 2, 3), jnp.swapaxes(total, 2, 3)


def splat_feat_nd(init_grid, feat, coords, exact: bool = True):
    """Splat features into an n-D grid.

    Args:
      init_grid: (B, F, *grid_dims) initial grid (usually zeros).
      feat: (B, F, nPt) per-point features.
      coords: (B, nDims, nPt) normalized coords in [-1, 1] per grid dim.
      exact: replicate the reference's per-corner round-to-integer.

    Returns:
      (B, F, *grid_dims) accumulated grid.
    """
    grid_dims = init_grid.shape[2:]
    b, f = init_grid.shape[0], init_grid.shape[1]
    n_dims = len(grid_dims)

    pos_dim = []
    wts_dim = []
    for d in range(n_dims):
        # normalized [-1,1] -> continuous voxel coordinate
        pos = coords[:, d, :] * (grid_dims[d] / 2.0) + grid_dims[d] / 2.0  # (B, nPt)
        pos_d, wts_d = [], []
        for ix in (0, 1):
            pos_ix = jnp.floor(pos) + ix
            # NOTE: the reference excludes index 0 (pos_ix > 0), not >= 0
            safe = ((pos_ix > 0) & (pos_ix < grid_dims[d])).astype(pos.dtype)
            wts_ix = (1.0 - jnp.abs(pos - pos_ix)) * safe
            pos_d.append(pos_ix * safe)
            wts_d.append(wts_ix)
        pos_dim.append(pos_d)
        wts_dim.append(wts_d)

    flat = init_grid.reshape(b, f, -1)
    n_cells = flat.shape[-1]

    def corner_contrib(ix_d):
        wts = jnp.ones_like(wts_dim[0][0])
        index = jnp.zeros_like(wts_dim[0][0])
        for d in range(n_dims):
            index = index * grid_dims[d] + pos_dim[d][ix_d[d]]
            wts = wts * wts_dim[d][ix_d[d]]
        return index.astype(jnp.int32), feat * wts[:, None, :]  # (B,nPt),(B,F,nPt)

    corners = list(itertools.product(*([(0, 1)] * n_dims)))

    def scatter_one(acc, index, vals):
        # acc: (F, n_cells); index: (nPt,); vals: (F, nPt)
        return acc.at[:, index].add(vals)

    if exact:
        for ix_d in corners:
            index, vals = corner_contrib(ix_d)
            flat = jax.vmap(scatter_one)(flat, index, vals)
            flat = jnp.round(flat)
    else:
        idx_all = []
        val_all = []
        for ix_d in corners:
            index, vals = corner_contrib(ix_d)
            idx_all.append(index)
            val_all.append(vals)
        index = jnp.concatenate(idx_all, axis=-1)
        vals = jnp.concatenate(val_all, axis=-1)
        flat = jax.vmap(scatter_one)(flat, index, vals)

    return flat.reshape(init_grid.shape)
