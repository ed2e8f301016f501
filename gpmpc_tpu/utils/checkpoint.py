"""Checkpoint / resume for campaigns and learning loops.

The reference only has per-object pickle persistence with no mid-run resume
(SURVEY.md §5.4). Here any pytree (GP state, safe set, scan carry, PRNG keys)
checkpoints to orbax when available, with an npz fallback, enabling true
mid-campaign resume on pod jobs.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import orbax.checkpoint as ocp

    HAS_ORBAX = True
except Exception:  # pragma: no cover
    HAS_ORBAX = False


def save_pytree(path: str, tree: Any) -> None:
    """Save any pytree; orbax when available, flat-npz otherwise."""
    path = os.path.abspath(path)
    if HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
    else:
        leaves, _ = jax.tree.flatten(tree)
        np.savez(path + ".npz", *[np.asarray(x) for x in leaves])


def restore_pytree(path: str, template: Any) -> Any:
    """Restore into the structure of ``template``."""
    path = os.path.abspath(path)
    if HAS_ORBAX and os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, template)
    data = np.load(path + ".npz")
    leaves = [jnp.asarray(data[k]) for k in data.files]
    _, treedef = jax.tree.flatten(template)
    return jax.tree.unflatten(treedef, leaves)


class CampaignCheckpointer:
    """Step-indexed checkpoints with retention (mid-campaign resume)."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(self, step: int, state: Any) -> None:
        save_pytree(self._path(step), state)
        self._prune()

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                steps.append(int(name[5:13]))
        return max(steps) if steps else None

    def restore_latest(self, template: Any) -> tuple[Optional[int], Any]:
        step = self.latest_step()
        if step is None:
            return None, template
        return step, restore_pytree(self._path(step), template)

    def _prune(self) -> None:
        entries = sorted(
            n for n in os.listdir(self.directory) if n.startswith("step_")
        )
        for name in entries[: -self.keep]:
            p = os.path.join(self.directory, name)
            if os.path.isdir(p):
                import shutil

                shutil.rmtree(p, ignore_errors=True)
            else:
                os.remove(p)
