"""Tensor-parallel parameter shardings for the attention stacks (2-D mesh).

The reference scales exclusively by DDP replication (main.py:66,104,129);
every GPU holds the full model. On TPU the natural extension is a 2-D
``Mesh`` ``(data, model)`` where the transformer weights are Megatron-style
sharded over the ``model`` axis and XLA/GSPMD inserts the collectives:

  * attention ``in_proj_kernel`` (E, 3E)  -> column-sharded  P(None, model)
  * attention ``out_kernel``     (E, E)   -> row-sharded     P(model, None)
  * FFN ``linear1`` kernel       (E, F)   -> column-sharded  P(None, model)
  * FFN ``linear2`` kernel       (F, E)   -> row-sharded     P(model, None)
  * the matching output biases of column-sharded matmuls    P(model)

so each self/cross-attention block costs one all-reduce for the attention
output and one for the FFN output, exactly the Megatron-LM recipe. All
other parameters (convs, norms, tables) stay replicated: the conv pyramid
is data-parallel-dominated at these sizes and the attention stacks are the
only O(E^2) weights. Everything flows through GSPMD propagation — the
model code is untouched; only the placement of the parameter pytree
changes. Note the reference keeps torch's packed q|k|v ``in_proj`` layout
(layers.py parity), so a model-axis shard holds a contiguous slice of the
packed 3E columns rather than whole q/k/v heads; GSPMD reshards around the
q/k/v split as needed, which is fine at these attention sizes (<2% of model
FLOPs) and keeps checkpoint import layout-identical to torch.

Sharding is by parameter *name*, mirroring how T5X/MaxText map logical axes:
the names below are the torch-parity names every attention stack in this
repo uses (``models/layers.py``, ``models/objcavit.py``).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from objcavit_tpu.parallel.mesh import MODEL_AXIS

# leaf-name -> (PartitionSpec builder, sharded-dim index) for 2-D kernels
_COLUMN = object()  # shard output features: P(None, model), dim 1
_ROW = object()  # shard input features (partial sums + psum): P(model, None), dim 0

_KERNEL_RULES = {
    "in_proj_kernel": _COLUMN,
    "out_kernel": _ROW,
}
_PARENT_KERNEL_RULES = {
    "linear1": _COLUMN,
    "linear2": _ROW,
}
# biases of column-sharded matmuls are themselves sharded over model
_SHARDED_BIASES = {"in_proj_bias"}
_PARENT_SHARDED_BIASES = {"linear1"}


def _path_names(path) -> list[str]:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "name"):
            out.append(str(p.name))
    return out


def tp_spec_for(path, leaf, n_model: int) -> P:
    """PartitionSpec for one parameter under tensor parallelism degree
    ``n_model``. Parameters whose sharded dim does not divide evenly stay
    replicated (correctness first; GSPMD requires even tiles)."""
    names = _path_names(path)
    if not names:
        return P()
    name = names[-1]
    parent = names[-2] if len(names) > 1 else ""

    rule = _KERNEL_RULES.get(name)
    if rule is None and name == "kernel":
        rule = _PARENT_KERNEL_RULES.get(parent)
    if rule is not None and getattr(leaf, "ndim", 0) == 2:
        dim = 1 if rule is _COLUMN else 0
        if leaf.shape[dim] % n_model == 0:
            return P(None, MODEL_AXIS) if rule is _COLUMN else P(MODEL_AXIS, None)
        return P()

    is_sharded_bias = name in _SHARDED_BIASES or (
        name == "bias" and parent in _PARENT_SHARDED_BIASES
    )
    if is_sharded_bias and getattr(leaf, "ndim", 0) == 1:
        if leaf.shape[0] % n_model == 0:
            return P(MODEL_AXIS)
    return P()


def tp_shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a parameter pytree on a 2-D mesh with the attention stacks
    Megatron-sharded over ``model`` and everything else replicated.

    Returns the same pytree as committed ``jax.Array``s; feed the result to
    ``TrainState.create`` (optax ``init`` builds moments with ``zeros_like``,
    which inherits each leaf's sharding) or straight into a jitted apply —
    GSPMD propagates the placements through the program.

    Aliasing note: ``jax.device_put`` reuses the source buffer for the shard
    that lands on the source device, so if the result is later *donated*
    (e.g. a train step with ``donate_argnums``) the input pytree's arrays
    are invalidated with it. Treat the returned tree as the canonical copy;
    if the un-sharded originals must survive, pass
    ``jax.tree.map(jnp.array, params)``.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def put(path, x):
        spec = tp_spec_for(path, x, n_model) if n_model > 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def count_tp_sharded(params: Any, n_model: int) -> int:
    """Number of leaves that receive a non-replicated spec (for asserts)."""
    n = 0

    def visit(path, x):
        nonlocal n
        if tp_spec_for(path, x, n_model) != P():
            n += 1
        return x

    jax.tree_util.tree_map_with_path(visit, params)
    return n
