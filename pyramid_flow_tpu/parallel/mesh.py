"""Device mesh + sharding rules (GSPMD replacement for FSDP/DDP/SP groups).

The reference manages four process-group flavors by hand (NCCL FSDP wrappers,
sequence-parallel groups, context-parallel groups, video-sync groups —
`trainer_misc/utils.py`, `trainer_misc/sp_utils.py`, `utils.py:19-105`). On
TPU all of it collapses to ONE ``jax.sharding.Mesh`` with named axes:

  dp    — data parallel (batch)
  fsdp  — parameter/optimizer sharding axis; ALSO consumes batch (ZeRO-style:
          data-parallel across fsdp shards, params all-gathered by XLA per
          layer, gradients reduce-scattered)
  sp    — sequence parallel (Ulysses all_to_all inside attention)

The reference's "video_sync_group" trick (N ranks share one video, each
training a different AR position) maps to indexing by position along the
data axes — see ``training.trainer``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MeshConfig", "make_mesh", "param_sharding", "batch_spec",
           "maybe_initialize_distributed",
           "DATA_AXES", "SP_AXIS", "FSDP_AXIS"]

DATA_AXES = ("dp", "fsdp")
FSDP_AXIS = "fsdp"
SP_AXIS = "sp"


_COORDINATOR_ENV_KEYS = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                         "MEGASCALE_COORDINATOR_ADDRESS")


def maybe_initialize_distributed():
    """Initialize multi-host JAX when running under a pod launcher.

    Replaces the reference's ``init_distributed_mode`` env:// NCCL setup
    (`trainer_misc/utils.py:71-107`). Like the reference — which hard-fails
    on a broken env:// rendezvous — a present-but-broken coordinator env is
    an ERROR, not a silent single-process fallback: training "successfully"
    with 1/N of the pod sharding nothing is the worst possible failure mode.
    Safe no-op when no coordinator env var is set (single-host) or when the
    runtime already initialized the pod.

    Outside auto-discovering launchers (TPU pod runtime, SLURM, OMPI) the
    rendezvous is specified explicitly via ``PF_NUM_PROCESSES`` /
    ``PF_PROCESS_ID`` alongside ``COORDINATOR_ADDRESS`` (the reference's
    ``WORLD_SIZE``/``RANK`` env:// contract); ``PF_DIST_INIT_TIMEOUT``
    (seconds) bounds the rendezvous wait.
    """
    import logging
    import os

    import jax

    # NOTE: must not call jax.process_count()/jax.devices() here — they
    # initialize the XLA backend, after which jax.distributed.initialize()
    # hard-fails. Detect "already initialized" via the distributed client.
    # The private probe is best-effort: if the module moves in a future jax,
    # fall through and let initialize() itself report double-init (only the
    # coordinator-env-present path may raise, never plain single-host runs).
    try:
        from jax._src import distributed as _jdist
        if getattr(_jdist.global_state, "client", None) is not None:
            return  # already initialized (runtime or a previous call)
    except ImportError:
        pass
    coord = [k for k in _COORDINATOR_ENV_KEYS if k in os.environ]
    if not coord:
        return
    kwargs = {}
    if "PF_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["PF_NUM_PROCESSES"])
        kwargs["process_id"] = int(os.environ["PF_PROCESS_ID"])
        kwargs["coordinator_address"] = os.environ[coord[0]]
    if "PF_DIST_INIT_TIMEOUT" in os.environ:
        kwargs["initialization_timeout"] = int(
            os.environ["PF_DIST_INIT_TIMEOUT"])
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        logging.getLogger(__name__).error(
            "jax.distributed.initialize() FAILED with coordinator env %s set: "
            "%s — refusing to silently degrade to single-process", coord, e)
        raise
    if jax.process_count() == 1:
        logging.getLogger(__name__).warning(
            "coordinator env %s set but process_count()==1 after init — "
            "running single-process", coord)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    fsdp: int = 1
    sp: int = 1
    # Only parameters with a divisible dim >= this many elements are sharded
    # on the fsdp axis (smaller ones replicate — the all-gather latency would
    # outweigh the memory win). Lower it to force tiny test models into the
    # genuinely-sharded regime.
    fsdp_min_dim: int = 1024

    @property
    def num_devices(self) -> int:
        return self.dp * self.fsdp * self.sp


def make_mesh(config: Optional[MeshConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build the (dp, fsdp, sp) mesh. Defaults: all devices on fsdp."""
    devices = list(devices if devices is not None else jax.devices())
    if config is None:
        config = MeshConfig(fsdp=len(devices))
    assert config.num_devices == len(devices), (
        f"mesh {config} needs {config.num_devices} devices, have {len(devices)}"
    )
    arr = np.asarray(devices).reshape(config.dp, config.fsdp, config.sp)
    return Mesh(arr, ("dp", "fsdp", "sp"))


def _spec_for_param(path: str, shape: Tuple[int, ...], fsdp_size: int,
                    min_dim: int = 1024) -> P:
    """Shard the largest divisible dim of each parameter on the fsdp axis.

    Equivalent in spirit to FSDP FULL_SHARD over transformer blocks
    (reference `train/train_pyramid_flow.py:286-296`), but expressed as a
    static sharding that XLA turns into per-layer all-gather / reduce-scatter.
    Small params (norms, biases, dims < ``min_dim``) stay replicated.
    """
    if fsdp_size == 1 or not shape:
        return P()
    # prefer the last dim, then the largest; require divisibility
    candidates = sorted(
        range(len(shape)), key=lambda i: (shape[i], i), reverse=True
    )
    for dim in candidates:
        if shape[dim] >= min_dim and shape[dim] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[dim] = FSDP_AXIS
            return P(*spec)
    return P()


def param_sharding(mesh: Mesh, params, verbose: bool = True,
                   min_shard_dim: int = 1024, stats_out: Optional[dict] = None):
    """NamedSharding tree for a parameter pytree.

    Logs the replicated-parameter fraction: with awkward mesh sizes the
    dim-divisibility rule in :func:`_spec_for_param` can silently leave
    most of the model replicated ("ZeRO-3" degrading to "mostly
    replicated"); surfacing the coverage makes that loud. ``stats_out``
    (optional dict) receives ``sharded``/``replicated`` element counts and
    ``sharded_fraction`` so callers (dryrun, tests) can *assert* the model
    actually runs in the sharded regime rather than trusting the log line.
    """
    fsdp_size = mesh.shape[FSDP_AXIS]
    stats = {"sharded": 0, "replicated": 0}

    def to_sharding(path, leaf):
        name = "/".join(str(p) for p in path)
        spec = _spec_for_param(name, leaf.shape, fsdp_size, min_shard_dim)
        size = int(np.prod(leaf.shape)) if leaf.shape else 1
        stats["sharded" if any(spec) else "replicated"] += size
        return NamedSharding(mesh, spec)

    tree = jax.tree_util.tree_map_with_path(to_sharding, params)
    total = stats["sharded"] + stats["replicated"]
    if stats_out is not None:
        stats_out.update(stats)
        stats_out["sharded_fraction"] = stats["sharded"] / max(total, 1)
    if verbose and fsdp_size > 1 and total:
        frac = stats["replicated"] / total
        import sys
        print(f"param_sharding: fsdp={fsdp_size}, "
              f"{stats['sharded']/1e6:.1f}M params sharded, "
              f"{stats['replicated']/1e6:.1f}M replicated "
              f"({frac:.1%} of parameter bytes NOT fsdp-sharded)",
              file=sys.stderr)
        if frac > 0.5:
            print("param_sharding: WARNING — most parameters are replicated; "
                  "check that major dims divide the fsdp axis size "
                  f"(min_shard_dim={min_shard_dim})",
                  file=sys.stderr)
    return tree


def batch_spec(extra_dims: int = 0) -> P:
    """Batch arrays: leading dim sharded over (dp, fsdp)."""
    return P(DATA_AXES, *([None] * extra_dims))
