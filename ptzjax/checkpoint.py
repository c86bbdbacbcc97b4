"""Checkpoint / resume for the online state and offline BA.

The reference has no checkpointing (results land in .mat/.txt at script end
— SURVEY.md §7); long-running multi-host jobs need restartability, so this
is a new subsystem: any pytree of arrays (SlamState, BAProblem, LM loop
carry) serializes to one .npz with its tree structure in a JSON sidecar
key. Pure host-side NumPy — no orbax dependency, no device sync beyond the
device_get.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np

# In-memory state-layout version. Bump whenever the MEANING of a state
# array changes without changing its shape/treedef (e.g. round 4's move to
# the blocked [cam6|thetas|phis] EKF covariance layout): the treedef check
# below cannot see such changes, and silently loading an old checkpoint
# would produce a scrambled filter.
#   v1: rounds 1-3 interleaved (theta,phi) EKF state layout.
#   v2: round-4+ blocked [cam6 | thetas | phis] layout (ekf.py).
STATE_LAYOUT_VERSION = 2


def save_pytree(path: str, tree: Any) -> None:
    """Serialize a pytree of arrays/scalars to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(jax.device_get(tree))
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(_treedef_to_str(treedef)).encode(), dtype=np.uint8
    )
    arrays["__layout_version__"] = np.asarray(
        STATE_LAYOUT_VERSION, dtype=np.int64
    )
    np.savez(path, **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by ``save_pytree``.

    Args:
      like: a pytree with the same structure (e.g. a freshly-initialized
        state) — the saved treedef string is checked against it, which
        catches config/capacity mismatches at load time instead of as
        shape errors mid-run.

    Raises:
      ValueError: on treedef mismatch, leaf-shape mismatch, or a
        state-layout version mismatch (checkpoints written before the
        blocked-EKF layout change load cleanly through the treedef check
        but would scramble the filter — refuse them explicitly).
    """
    d = np.load(path)
    saved_ver = int(d["__layout_version__"]) if "__layout_version__" in d else 1
    if saved_ver != STATE_LAYOUT_VERSION:
        raise ValueError(
            f"checkpoint state-layout version {saved_ver} != current "
            f"{STATE_LAYOUT_VERSION} (the EKF state layout changed; this "
            "checkpoint cannot be loaded — re-run from the sequence start)"
        )
    saved = json.loads(bytes(d["__treedef__"].tobytes()).decode())
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    if saved != _treedef_to_str(treedef):
        raise ValueError(
            f"checkpoint structure mismatch:\n saved: {saved}\n want:  "
            f"{_treedef_to_str(treedef)}"
        )
    n = len(leaves_like)
    leaves = [d[f"leaf_{i}"] for i in range(n)]
    for i, (a, b) in enumerate(zip(leaves, leaves_like)):
        if hasattr(b, "shape") and tuple(a.shape) != tuple(np.shape(b)):
            raise ValueError(
                f"leaf {i} shape {a.shape} != expected {np.shape(b)} "
                "(capacity/config changed since checkpoint)"
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _treedef_to_str(treedef) -> str:
    return str(treedef)
