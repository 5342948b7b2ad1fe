"""Orbax checkpointing: async, sharding-preserving train-state snapshots.

The msgpack path (`train/checkpoint.py`) gathers the full state to host
and blocks training while it serializes — fine for single-host runs, but
the wrong shape for production TPU pods where the optimizer state of a
SAM-H model is ~7.6 GB of fp32 and lives sharded across chips. This
module wraps `orbax.checkpoint.CheckpointManager`:

- **async saves**: the manager snapshots device arrays and commits to disk
  on a background thread; the train loop resumes immediately.
- **sharded-native**: each host writes only its addressable shards
  (OCDBT/zarr layout); restore places shards directly onto the original
  `NamedSharding` without a host gather round-trip.
- **retention + best-tracking**: `max_to_keep` garbage-collects old steps;
  `monitor`/`mode` keep the best-metric checkpoint alive regardless.

Mirrors the reference's checkpoint *semantics* (epoch, model/optimizer
state, metadata — `/root/reference/base_ml/base_trainer.py:229-269`) in a
TPU-native container format. Torch-schema export for interchange remains
`train/checkpoint.py:export_reference_checkpoint`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax

import orbax.checkpoint as ocp

_STATE_KEYS = ("params", "batch_stats", "opt_state", "step")


def _state_payload(state) -> Dict[str, Any]:
    return {k: getattr(state, k) for k in _STATE_KEYS}


def _abstract_like(tree):
    """ShapeDtypeStruct pytree carrying each leaf's sharding (if any), so
    orbax restores shards straight onto the live mesh layout."""

    def leaf(x):
        x = jax.numpy.asarray(x) if not hasattr(x, "shape") else x
        sharding = getattr(x, "sharding", None)
        if isinstance(sharding, jax.sharding.Sharding):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    return jax.tree_util.tree_map(leaf, tree)


class OrbaxCheckpointer:
    """Thin lifecycle wrapper over `ocp.CheckpointManager` for TrainState.

    Parameters mirror the fit-loop needs: `monitor`/`mode` select which
    validation scalar ranks checkpoints (the best one is never GC'd),
    `max_to_keep` bounds disk, `async_save=False` forces synchronous
    commits (tests, or hosts without a spare core).
    """

    def __init__(
        self,
        directory: Path,
        *,
        max_to_keep: int = 3,
        monitor: Optional[str] = None,
        mode: str = "max",
        async_save: bool = True,
    ) -> None:
        directory = Path(directory).absolute()
        directory.mkdir(parents=True, exist_ok=True)
        best_fn = None
        preservation = None
        if monitor is not None:
            key = monitor
            worst = float("-inf") if mode == "max" else float("inf")

            def best_fn(metrics: Dict[str, float]) -> float:  # noqa: F811
                return float(metrics.get(key, worst))

            # Retention must keep BOTH the metric-best N and the latest
            # step: orbax's implicit best_fn policy is BestN-only, which
            # GC's the newest checkpoint whenever its metric isn't
            # top-N — crash/resume would then silently lose the most
            # recent epochs (reference latest_checkpoint semantics,
            # base_trainer.py:203-211). LatestN(1) pins the newest save
            # (metrics or not), and keep_checkpoints_without_metrics=False
            # stops metric-less save_latest() snapshots from accumulating
            # unboundedly between eval epochs.
            pp = ocp.checkpoint_managers.preservation_policy
            preservation = pp.AnyPreservationPolicy([
                pp.LatestN(n=1),
                pp.BestN(
                    get_metric_fn=best_fn,
                    reverse=(mode == "min"),
                    n=max_to_keep,
                    keep_checkpoints_without_metrics=False,
                ),
            ])

        options = ocp.CheckpointManagerOptions(
            # preservation_policy and max_to_keep are mutually exclusive in
            # the options; the BestN(n=max_to_keep)+LatestN(1) policy
            # subsumes max_to_keep when a monitor is set.
            max_to_keep=None if preservation is not None else max_to_keep,
            best_fn=best_fn,
            best_mode=mode,
            preservation_policy=preservation,
            enable_async_checkpointing=async_save,
        )
        self.manager = ocp.CheckpointManager(directory, options=options)

    # ------------------------------------------------------------- save

    def save(
        self,
        step: int,
        state,
        *,
        metrics: Optional[Dict[str, float]] = None,
        meta: Optional[Dict[str, Any]] = None,
    ) -> bool:
        """Queue an async snapshot of `state` at `step`. Returns whether the
        manager accepted the save (it may skip per retention policy)."""
        metrics = {
            k: float(v)
            for k, v in (metrics or {}).items()
            if isinstance(v, (int, float)) or hasattr(v, "item")
        }
        return self.manager.save(
            int(step),
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(_state_payload(state)),
                meta=ocp.args.JsonSave(dict(meta or {})),
            ),
            metrics=metrics or None,
        )

    # ---------------------------------------------------------- restore

    def restore(
        self, state_template, step: Optional[int] = None
    ) -> Tuple[Any, Dict[str, Any]]:
        """Restore into the structure (and shardings) of `state_template`.

        `step=None` restores the latest; pass `self.best_step()` for the
        best-monitored one. Returns (state, meta)."""
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no orbax checkpoint under {self.manager.directory}"
            )
        abstract = _abstract_like(_state_payload(state_template))
        restored = self.manager.restore(
            int(step),
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                meta=ocp.args.JsonRestore(),
            ),
        )
        payload = restored["state"]
        new_state = state_template.replace(
            **{k: payload[k] for k in _STATE_KEYS}
        )
        return new_state, dict(restored["meta"] or {})

    # --------------------------------------------------------- queries

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def best_step(self) -> Optional[int]:
        return self.manager.best_step()

    def wait(self) -> None:
        """Block until queued async saves are durably committed."""
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()

    def __enter__(self) -> "OrbaxCheckpointer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
