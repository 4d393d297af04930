"""Checkpoint / resume: the full experiment state, not just flow weights.

The reference only saves flow weights at the end of training
(``main_algorithm_1.py:326-327``, ``main_algorithm_2.py:468-471``) and never
checkpoints MCMC state — there is no resume story (SURVEY.md §5).  Here a
checkpoint captures everything needed for bit-exact continuation:

  {flow params, optimizer state, chain state (positions, energies,
   displacement adaption, counters, PRNG keys), cycle index, config snapshot}

Orbax handles the array tree; small metadata rides along as JSON.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save_checkpoint(directory: str, step: int, tree: Any,
                    metadata: Optional[Dict[str, Any]] = None) -> str:
    """Save a pytree checkpoint at ``directory/step_<step>``."""
    directory = os.path.abspath(directory)
    path = os.path.join(directory, f"step_{step:08d}")
    tree = jax.device_get(tree)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, "tree"), tree)
        ckptr.wait_until_finished()
    else:  # pragma: no cover - fallback
        os.makedirs(path, exist_ok=True)
        import pickle
        with open(os.path.join(path, "tree.pkl"), "wb") as f:
            pickle.dump(tree, f)
    if metadata is not None:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2)
    return path


def latest_checkpoint(directory: str) -> Optional[Tuple[int, str]]:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append((int(name[5:]), os.path.join(directory, name)))
            except ValueError:
                continue
    return max(steps) if steps else None


def restore_checkpoint(path: str, example_tree: Any
                       ) -> Tuple[Any, Optional[Dict[str, Any]]]:
    """Restore a pytree saved by ``save_checkpoint``.

    ``example_tree`` provides the structure/shapes (standard Orbax restore
    contract).
    """
    if _HAS_ORBAX and os.path.isdir(os.path.join(path, "tree")):
        ckptr = ocp.StandardCheckpointer()
        example = jax.device_get(example_tree)
        tree = ckptr.restore(os.path.join(path, "tree"), example)
    else:  # pragma: no cover - fallback
        import pickle
        with open(os.path.join(path, "tree.pkl"), "rb") as f:
            tree = pickle.load(f)
    meta_path = os.path.join(path, "metadata.json")
    metadata = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return tree, metadata
