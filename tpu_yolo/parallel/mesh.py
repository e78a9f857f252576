"""Device mesh + sharding layout for SPMD data parallelism.

TPU-native replacement for the reference's process-per-GPU DDP stack
(reference main.py:342-344 NCCL init, main.py:81-84 DDP wrap, main.sh:2
torch.distributed.launch). There is no process wrapper and no explicit
collective anywhere: one `jax.sharding.Mesh` spans every chip, the batch
is sharded along the `data` axis, params/optimizer/EMA are replicated,
and XLA compiles the gradient cross-chip `psum` onto ICI (intra-slice)
or DCN (inter-slice) automatically when a jitted function reduces a
sharded batch into replicated grads.

SyncBatchNorm (reference main.py:81-84) falls out for free: batch-norm
statistics inside the jitted train step are means over the *global*
batch axis, so XLA inserts the same cross-chip reduction DDP's SyncBN
performs explicitly.

A second mesh axis ``model`` carries channel tensor-parallelism:
`shard_model_parallel` splits every wide conv kernel's output channels
(plus its bias/BN vectors and the optimizer/EMA mirrors) over the axis
and GSPMD inserts the all-gather/psum collectives a hand-written
Megatron implementation would place. The reference has only DP
(SURVEY.md §2); at its model sizes pure DP (n_model=1) remains the
default, with TP a mesh-shape knob for larger variants — exercised by
tests/test_parallel.py::test_tensor_parallel_train_step and the
driver's dp x tp dryrun (__graft_entry__.py).
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _mesh2(n_data, n_second, axis_names, devices) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_second
    if n_data < 1 or n_data * n_second > len(devices):
        raise ValueError(f"need {max(n_data, 1) * n_second} devices for a "
                         f"{axis_names} mesh, have {len(devices)}")
    use = np.asarray(devices[: n_data * n_second]).reshape(n_data, n_second)
    return Mesh(use, axis_names)


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build an (data, model) mesh over all visible devices by default."""
    return _mesh2(n_data, n_model, ("data", "model"), devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the data axis, rest replicated."""
    return NamedSharding(mesh, P("data"))


def make_spatial_mesh(n_data: int | None = None, n_spatial: int = 2,
                      devices=None) -> Mesh:
    """(data, spatial) mesh for high-resolution spatial partitioning.

    The reference's only scaling story is DDP (SURVEY.md §2); on TPU a
    second idiomatic axis exists for the resolution direction: shard the
    image HEIGHT across chips and GSPMD partitions every conv with
    automatic halo exchange on ICI — no kernel changes, numerics match
    the unsharded forward (tests/test_parallel.py). Useful when one
    high-res image (1280px+) should ride several chips.
    """
    return _mesh2(n_data, n_spatial, ("data", "spatial"), devices)


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch split over (batch -> data, height -> spatial)."""
    return NamedSharding(mesh, P("data", "spatial"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


@dataclasses.dataclass
class DataParallel:
    """Sharding bundle for the train/eval steps.

    `shard_batch` places host arrays so their leading axis is split over
    the data axis (global batch must divide the data-axis size);
    `replicate` places pytrees fully-replicated (params, optimizer state,
    EMA). jit then compiles collectives as needed — the JAX answer to
    DistributedSampler + DDP + SyncBN.
    """

    mesh: Mesh

    @property
    def num_data_shards(self) -> int:
        return self.mesh.shape["data"]

    def shard_batch(self, tree):
        """Host array(s) -> batch-sharded global array(s).

        Single-host: a plain device_put split over the data axis.
        Multi-host (jax.process_count() > 1): each process passes its
        *host-local* batch shard and the pieces are assembled into one
        global array via jax.make_array_from_process_local_data, so the
        shape a jitted step sees (and scales the loss by) is the true
        global batch — not the per-host slice.
        """
        s = batch_sharding(self.mesh)
        if jax.process_count() > 1:
            put = lambda x: jax.make_array_from_process_local_data(s, np.asarray(x))
        else:
            put = lambda x: jax.device_put(x, s)
        return jax.tree_util.tree_map(put, tree)

    def replicate(self, tree):
        s = replicated_sharding(self.mesh)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

    # -- tensor parallelism over the `model` axis ----------------------

    def model_sharding_spec(self, x, min_channels: int = 256):
        """NamedSharding for one array under channel tensor-parallelism.

        Megatron-style column sharding expressed the XLA way: any array
        whose last dimension is wide enough and divisible by the model
        axis is split on that dimension — conv kernels (H, W, I, O) on
        O, their bias/BN vectors (O,) alongside, and the optimizer/EMA
        mirrors automatically (same shapes). Everything else (narrow
        layers, scalars) replicates. GSPMD then propagates activation
        shardings and inserts the all-gather/psum collectives a
        hand-written TP implementation would place — see
        ARCHITECTURE.md §5: annotate placement, let XLA do collectives.
        """
        n = self.mesh.shape["model"]
        shape = getattr(x, "shape", ())
        if (n > 1 and len(shape) >= 1 and shape[-1] >= min_channels
                and shape[-1] % n == 0):
            spec = P(*([None] * (len(shape) - 1) + ["model"]))
            return NamedSharding(self.mesh, spec)
        return replicated_sharding(self.mesh)

    def shard_model_parallel(self, tree, min_channels: int = 256):
        """Place a param/state pytree under channel tensor-parallelism
        (replicate() when the model axis is size 1)."""
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, self.model_sharding_spec(x, min_channels)), tree)
