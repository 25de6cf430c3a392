"""Training checkpoint save/resume (orbax-backed).

The reference is inference-only (SURVEY.md §5: checkpoint *loading* only);
this provides the production-trainer side: periodic sharded checkpoints of
(params, opt_state, step) with atomic directory swaps and resume-from-latest,
via orbax — the JAX-native checkpointing library (multi-host aware, async).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


def _manager(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        Path(ckpt_dir).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_train_state(ckpt_dir: str, step: int, params: Any, opt_state: Any,
                     max_to_keep: int = 3) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.Composite(
        params=ocp.args.StandardSave(params),
        opt_state=ocp.args.StandardSave(opt_state),
    ))
    mgr.wait_until_finished()


def restore_train_state(ckpt_dir: str, params_template: Any, opt_state_template: Any):
    """Returns (step, params, opt_state) from the latest checkpoint, or None."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        return None
    restored = mgr.restore(step, args=ocp.args.Composite(
        params=ocp.args.StandardRestore(params_template),
        opt_state=ocp.args.StandardRestore(opt_state_template),
    ))

    # Re-place onto the templates' shardings: some orbax versions restore
    # (replicated) leaves onto the default device only, which then clashes
    # with mesh-sharded params inside one jitted step.
    def _replace(x, t):
        if isinstance(t, jax.Array) and hasattr(t, "sharding"):
            return jax.device_put(x, t.sharding)
        return x

    params = jax.tree.map(_replace, restored["params"], params_template)
    opt_state = jax.tree.map(_replace, restored["opt_state"], opt_state_template)
    return step, params, opt_state


def save_inference_params(path: str, params: Any) -> None:
    """Export inference weights as a reference-compatible flat safetensors?
    No — safetensors needs torch-style names; instead save an orbax tree.
    (The reference-format converter remains the load path for its ckpts.)"""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).absolute(), params)
    ckptr.wait_until_finished()


def load_inference_params(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), template)


def profile_trace(log_dir: str = "/tmp/zonos_tpu_trace"):
    """Context manager: capture a jax.profiler trace viewable in XProf/TensorBoard
    (the tracing hook the reference lacks, SURVEY.md §5)."""
    return jax.profiler.trace(log_dir)
