"""GPipe-style pipeline parallelism over a stack of identical layers.

The reference never needed pipeline parallelism (single-node DDP,
SURVEY.md §2.4); this building block exists so the larger presets can scale
past what tensor parallelism alone serves. TPU-native design: the layer
stack is sharded over a ``pipe`` mesh axis (one or more layers per stage),
microbatches stream through the stages via ``lax.ppermute`` ring shifts
inside a single ``lax.scan`` — one compiled program, collectives ride ICI,
no host round-trips. The schedule is plain GPipe: ``M + P - 1`` ticks for
``M`` microbatches over ``P`` stages; every stage computes every tick
(bubble ticks produce discarded values), the last stage's valid outputs are
broadcast with a masked ``psum``.

Composes with data parallelism: give the mesh a ``data`` axis and the batch
is split across it before microbatching (see ``make_pipe_mesh`` /
``test_pipeline.py::test_dp_pp_composition``).

Differentiable end-to-end (``ppermute``/``psum`` have exact transposes), so
the same function serves training; pair with ``jax.checkpoint`` on the
layer fn for activation memory.

Why GPipe and not 1F1B/interleaved here: 1F1B's memory win (P instead of
M microbatches in flight) comes from running a microbatch's backward as
soon as the LAST stage finishes its forward — which requires the loss to
be computed inside the pipelined region. This pipeline covers the encoder
segment of a larger differentiable graph (decoder + CTC/NLL losses run
after it), so output cotangents only exist once the whole outer forward
completes; fwd and bwd are necessarily separate phases and autodiff
through the scan (+ remat on the layer fn) is already the optimal
schedule shape. The bubble fraction (P-1)/(M+P-1) is controlled by
``num_microbatches`` — raise M to amortize it; interleaved virtual
stages would not help a forward-phase-only pipeline (bubble work is
(P-1)·(L/P) layer-applications regardless of chunking).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["make_pipe_mesh", "stack_layer_params", "pipeline_apply",
           "pipeline_apply_sequential", "PipelineSpec"]


class PipelineSpec(NamedTuple):
    """Static pipeline configuration carried by the train StepConfig.

    ``mesh`` must have the ``axis`` (pipeline stages) and, when data
    parallelism composes, ``data_axis`` axes; ``num_microbatches=None``
    defaults to the stage count (minimum bubble-free occupancy — raise it
    to shrink the GPipe bubble fraction (P-1)/(M+P-1)).

    ``sequential_reference=True`` swaps the GPipe executor for
    :func:`pipeline_apply_sequential` — the no-ring reference that runs
    the IDENTICAL (microbatch, layer, data-shard) schedule, used to prove
    dropout-on pipelined training exact (see that function's docstring)."""

    mesh: Mesh
    axis: str = "pipe"
    data_axis: Optional[str] = "data"
    num_microbatches: Optional[int] = None
    sequential_reference: bool = False

    @property
    def row_multiple(self) -> int:
        """Global batch rows must divide data_size * num_microbatches."""
        d = self.mesh.shape[self.data_axis] if self.data_axis else 1
        m = self.num_microbatches or self.mesh.shape[self.axis]
        return d * m


def make_pipe_mesh(data: int = 1, pipe: int = -1, devices=None) -> Mesh:
    """Build a (data, pipe) mesh; pipe=-1 takes all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if pipe == -1:
        if n % data:
            raise ValueError(f"{n} devices not divisible by data={data}")
        pipe = n // data
    devices = devices[: data * pipe].reshape(data, pipe)
    return Mesh(devices, axis_names=("data", "pipe"))


def stack_layer_params(per_layer: list) -> Any:
    """Stack L identically-structured per-layer pytrees -> leading dim L."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_layer
    )


def pipeline_apply(
    layer_fn: Callable,
    stacked_params: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: Optional[str] = None,
    num_microbatches: Optional[int] = None,
    extra: Any = None,
    mb_extra: Any = None,
):
    """Run ``x`` through L stacked layers pipelined over the ``axis`` stages.

    layer_fn(params_i, x_mb[, extra_mb][, mb_extra_i]) -> x_mb applies ONE
    layer to one microbatch. ``stacked_params`` has leading dim L (L % P ==
    0; L//P layers run sequentially per stage). ``x`` is (B, ...) with B
    divisible by ``num_microbatches`` (default: P) times the data-axis size.
    ``extra`` is an optional pytree of per-example tensors (leading dim B) —
    e.g. attention bias — microbatched alongside ``x`` and delivered to the
    stage currently holding that microbatch. ``mb_extra`` is an optional
    pytree of PER-MICROBATCH values (leading dim ``num_microbatches``,
    replicated across the mesh) — e.g. dropout keys; when given, layer_fn
    receives it as its last positional argument (after extra_mb if ``extra``
    is also given).
    """
    P_ = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(stacked_params)
    L = leaves[0].shape[0]
    if L % P_:
        raise ValueError(f"{L} layers not divisible by {P_} pipeline stages")
    D = mesh.shape[data_axis] if data_axis else 1
    B = x.shape[0]
    if B % D:
        raise ValueError(f"batch {B} not divisible by data axis {D}")
    M = int(num_microbatches) if num_microbatches else P_
    if (B // D) % M:
        raise ValueError(
            f"per-data-shard batch {B // D} not divisible by "
            f"num_microbatches={M}"
        )

    param_specs = jax.tree_util.tree_map(
        lambda _: P(axis), stacked_params
    )
    batch_spec = P(data_axis) if data_axis else P()
    extra_specs = jax.tree_util.tree_map(lambda _: batch_spec, extra)
    mb_extra_specs = jax.tree_util.tree_map(lambda _: P(), mb_extra)

    def stage_program(params_local, x_local, extra_local, mb_extra_local):
        idx = lax.axis_index(axis)
        mb = x_local.shape[0] // M
        xs = x_local.reshape(M, mb, *x_local.shape[1:])
        extras = jax.tree_util.tree_map(
            lambda e: e.reshape(M, mb, *e.shape[1:]), extra_local
        )

        def local_layers(h, ex, mbex):
            def body(carry, p):
                args = [carry]
                if extra is not None:
                    args.append(ex)
                if mb_extra is not None:
                    args.append(mbex)
                return layer_fn(p, *args), None

            h, _ = lax.scan(body, h, params_local)
            return h

        fwd = [(i, i + 1) for i in range(P_ - 1)]

        def tick(state, t):
            # stage s at tick t holds microbatch t - s (valid when 0<=t-s<M)
            mb_idx = jnp.clip(t - idx, 0, M - 1)
            cur = jnp.where(idx == 0, xs[mb_idx], state)
            ex = jax.tree_util.tree_map(lambda e: e[mb_idx], extras)
            mbex = jax.tree_util.tree_map(
                lambda e: e[mb_idx], mb_extra_local
            )
            out = local_layers(cur, ex, mbex)
            nxt = lax.ppermute(out, axis, fwd)
            return nxt, out

        _, outs = lax.scan(
            tick, jnp.zeros_like(xs[0]), jnp.arange(M + P_ - 1)
        )
        # keep the last stage's outputs, make them replicated over the axis
        mask = (idx == P_ - 1).astype(outs.dtype)
        outs = lax.psum(outs * mask, axis)
        return outs[P_ - 1:].reshape(x_local.shape)

    shmap = jax.shard_map(
        stage_program,
        mesh=mesh,
        in_specs=(param_specs, batch_spec, extra_specs, mb_extra_specs),
        out_specs=batch_spec,
        check_vma=False,
    )
    return shmap(stacked_params, x, extra, mb_extra)


def pipeline_apply_sequential(
    layer_fn: Callable,
    stacked_params: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: Optional[str] = None,
    num_microbatches: Optional[int] = None,
    extra: Any = None,
    mb_extra: Any = None,
):
    """No-ring reference executor for :func:`pipeline_apply`.

    Runs the SAME schedule — ``layer_fn(params_l, x_mb[, extra_mb][,
    mb_extra_m])`` for every (microbatch m, layer l), under the same mesh
    so ``lax.axis_index(data_axis)`` resolves identically inside
    ``layer_fn`` — but executes it as a plain microbatch×layer double
    scan on every device (params replicated, no ppermute ring, no bubble
    ticks, no masked psum broadcast).

    This is the *specification* of pipelined execution: for any layer_fn,
    including one that draws per-(microbatch, layer, data-shard) dropout
    keys from ``mb_extra``, ``pipeline_apply == pipeline_apply_sequential``
    exactly. The dropout-on pipelined TRAIN parity leg of
    ``__graft_entry__.dryrun_multichip`` and
    ``tests/test_pipeline.py`` assert precisely this — the GPipe
    machinery must not perturb the math even when the layers are
    stochastic (the per-key schedule travels with the microbatch, not
    with the executor)."""
    P_ = mesh.shape[axis]
    D = mesh.shape[data_axis] if data_axis else 1
    B = x.shape[0]
    if B % D:
        raise ValueError(f"batch {B} not divisible by data axis {D}")
    M = int(num_microbatches) if num_microbatches else P_
    if (B // D) % M:
        raise ValueError(
            f"per-data-shard batch {B // D} not divisible by "
            f"num_microbatches={M}"
        )

    # params replicated (the sequential reference sees the whole stack)
    param_specs = jax.tree_util.tree_map(lambda _: P(), stacked_params)
    batch_spec = P(data_axis) if data_axis else P()
    extra_specs = jax.tree_util.tree_map(lambda _: batch_spec, extra)
    mb_extra_specs = jax.tree_util.tree_map(lambda _: P(), mb_extra)

    def program(params_all, x_local, extra_local, mb_extra_local):
        mb = x_local.shape[0] // M
        xs = x_local.reshape(M, mb, *x_local.shape[1:])
        extras = jax.tree_util.tree_map(
            lambda e: e.reshape(M, mb, *e.shape[1:]), extra_local
        )

        def do_microbatch(m, h):
            ex = jax.tree_util.tree_map(lambda e: e[m], extras)
            mbex = jax.tree_util.tree_map(
                lambda e: e[m], mb_extra_local
            )

            def body(carry, p):
                args = [carry]
                if extra is not None:
                    args.append(ex)
                if mb_extra is not None:
                    args.append(mbex)
                return layer_fn(p, *args), None

            h, _ = lax.scan(body, h, params_all)
            return h

        def mb_step(carry, m):
            return carry, do_microbatch(m, xs[m])

        _, outs = lax.scan(mb_step, jnp.zeros((), x.dtype),
                           jnp.arange(M))
        return outs.reshape(x_local.shape)

    shmap = jax.shard_map(
        program,
        mesh=mesh,
        in_specs=(param_specs, batch_spec, extra_specs, mb_extra_specs),
        out_specs=batch_spec,
        check_vma=False,
    )
    return shmap(stacked_params, x, extra, mb_extra)
