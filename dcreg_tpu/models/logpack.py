"""Flat-packed per-iteration telemetry buffer.

Carrying ~30 separate log arrays through a ``lax.while_loop`` and updating
each with its own dynamic-update-slice makes XLA:CPU compile time explode
(~100x: 4s -> 440s for the ICP engine).  Instead, each iteration packs its
whole ``IterationLogData`` equivalent into ONE flat float row and the loop
carries ONE (max_iter, ROW) buffer updated with ONE dynamic-update-slice.
The structured ``IterationLog`` pytree is reconstructed outside the loop by
slicing -- same information, constant number of buffer ops.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

# field -> (shape, kind) ; kind in {"f", "i", "b"} (stored as the log dtype,
# cast back on unpack)
LOG_SPEC: List[Tuple[str, Tuple[int, ...], str]] = [
    ("executed", (), "b"),
    ("effective_points", (), "i"),
    ("corr_num", (), "i"),
    ("rmse", (), "f"),
    ("fitness", (), "f"),
    ("objective", (), "f"),
    ("gradient", (6,), "f"),
    ("dx", (6,), "f"),
    ("transform", (4, 4), "f"),
    ("trans_error", (), "f"),
    ("rot_error_deg", (), "f"),
    ("eigenvalues_full", (6,), "f"),
    ("singular_values", (6,), "f"),
    ("lambda_schur_rot", (3,), "f"),
    ("lambda_schur_trans", (3,), "f"),
    ("V_schur_rot", (3, 3), "f"),
    ("V_schur_trans", (3, 3), "f"),
    ("lambda_diag_rot", (3,), "f"),
    ("lambda_diag_trans", (3,), "f"),
    ("cond_full", (), "f"),
    ("cond_schur_rot", (), "f"),
    ("cond_schur_trans", (), "f"),
    ("cond_diag_rot", (), "f"),
    ("cond_diag_trans", (), "f"),
    ("cond_full_sub_rot", (), "f"),
    ("cond_full_sub_trans", (), "f"),
    ("is_degenerate", (), "b"),
    ("degenerate_mask", (6,), "b"),
    ("pcg_iterations", (), "i"),
    ("pcg_residual", (), "f"),
    ("cond_PH", (), "f"),
    ("P_preconditioner", (6, 6), "f"),
    ("W_adaptive", (6, 6), "f"),
    ("H", (6, 6), "f"),
]

_OFFSETS: Dict[str, Tuple[int, int, Tuple[int, ...], str]] = {}
_off = 0
for _name, _shape, _kind in LOG_SPEC:
    _size = int(np.prod(_shape)) if _shape else 1
    _OFFSETS[_name] = (_off, _size, _shape, _kind)
    _off += _size
ROW_SIZE = _off


def pack_row(dtype, **fields):
    """Pack named field values into one flat (ROW_SIZE,) vector."""
    parts = []
    for name, shape, kind in LOG_SPEC:
        v = fields.get(name)
        if v is None:
            size = int(np.prod(shape)) if shape else 1
            fill = -1.0 if kind == "i" else (0.0 if kind == "b" else jnp.nan)
            parts.append(jnp.full((size,), fill, dtype))
        else:
            parts.append(jnp.asarray(v, dtype).reshape(-1))
    return jnp.concatenate(parts)


def unpack(buffer, field):
    """Slice one field out of the (I, ROW_SIZE) buffer -> (I, *shape)."""
    off, size, shape, kind = _OFFSETS[field]
    v = buffer[:, off:off + size]
    v = v.reshape((buffer.shape[0],) + shape) if shape else v[:, 0]
    if kind == "i":
        return jnp.nan_to_num(v, nan=-1.0).astype(jnp.int32)
    if kind == "b":
        return (v != 0) & ~jnp.isnan(v)
    return v


def empty_buffer(I, dtype):
    """Unwritten rows carry each field's 'missing' fill value."""
    row = pack_row(dtype)
    return jnp.tile(row[None, :], (I, 1))
