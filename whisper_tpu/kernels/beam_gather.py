"""Pallas row-permute for the beam KV cache (layout-preserving gather).

The beam loop must reorder cache rows by source beam every mixing step.
Constraints, all measured on v5e (large-v3, k5, int8 cache; full table in
decoding/device_beam.py):

  * ``jnp.take`` inside the while_loop pays XLA layout-reconciliation
    copies against the loop carry (the gather bytes were never the
    problem: 1.8 ms isolated vs 8.5 ms in-loop at b8);
  * the cache must be BATCH-LEADING (B, L, H, D, C — model/decoder.KVCache)
    so one row is a contiguous multi-MB span; with the layer-leading
    layout a row is L strided ~96 KB chunks and every copy strategy paid
    ~5x wire in per-chunk DMA latency;
  * the practical ceiling for ANY copy is the chip's ~311 GB/s read+write
    rate (not the 819 GB/s read-only figure), and XLA adds ~1 extra
    full-cache pass copying the carry around the custom call.

STATUS (r3): the production beam loops run copy-on-write row pointers
(decoding/device_beam.cow_assign) and materialize fork copies with
``lane_dot_permute`` below — a plain XLA dot on the TRANSPOSED view of the
cache, which matches the decode carry's batch-minor physical layout so the
transposes elide to bitcasts and no layout-reconciliation copies bracket
the op. Measured (b32 k5 int8 ctx128, one process, interleaved, ms/step):
no-copy floor 20.5; cond+cow_copy_rows kernel 27.1; cond+lane-dot 23.3
(fork-step cost 16.6 vs the kernel's 24.5 — the difference is exactly the
reconciliation the custom call forces). ``cow_copy_rows`` and the
``permute_rows_multi`` kernels are kept as the general standalone
row-permute (tested in tests/test_kernels.py) and as the documented
measured alternatives they anchor.

Two kernels, routed by shape in ``permute_rows_multi``:

  * raw HBM->HBM DMA (``_dma_kernel``): one program issues every
    (leaf, row) copy through a rolling semaphore window — no VMEM staging.
    Needs tile-aligned rows (minor dim % 128 == 0); wins at >=80 rows.
  * BlockSpec copy (``_permute_rows_blocked``): scalar-prefetched ``rows``
    feed the input index maps; program (j, li) moves every leaf's
    layer-chunk of logical row ``rows[j]`` into output row j, all leaves
    in ONE pallas_call. Handles unaligned (exact-sized) caches and
    interpret mode; wins at small row counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# XLA's scoped-vmem stack limit for custom kernels is 16 MB (v5e default);
# the pipeline double-buffers every in+out block, so the sum of padded block
# bytes (one direction) must stay under ~1/4 of that.
_VMEM_BLOCK_BUDGET = 3_500_000


def _padded_layer_bytes(a) -> int:
    """Bytes of one (1, 1, trailing...) block padded to the TPU tile grid
    (minor dim to 128; second-minor to the dtype's sublane multiple)."""
    trailing = a.shape[2:]
    if not trailing:
        return a.dtype.itemsize
    sub = {1: 32, 2: 16, 4: 8}.get(a.dtype.itemsize, 8)
    dims = list(trailing)
    dims[-1] = -(-dims[-1] // 128) * 128
    if len(dims) >= 2:
        dims[-2] = -(-dims[-2] // sub) * sub
    n = 1
    for d in dims:
        n *= d
    return n * a.dtype.itemsize


def _choose_lb(arrays) -> int:
    """Largest layer-chunk so all leaves' padded in+out blocks fit VMEM."""
    L = arrays[0].shape[1]
    layer_bytes = sum(_padded_layer_bytes(a) for a in arrays)
    for lb in (L, 32, 16, 8, 4, 2, 1):
        if lb <= L and L % lb == 0 and 2 * lb * layer_bytes <= _VMEM_BLOCK_BUDGET:
            return lb
    return 1


def _kernel(n: int):
    def kernel(rows_ref, *refs):
        del rows_ref  # consumed by the index maps
        for i in range(n):
            refs[n + i][...] = refs[i][...]

    return kernel


# In-flight DMA window. Each copy is a multi-MB contiguous row, so a small
# window already saturates the HBM channel; the window bounds live DMA
# semaphores.
_DMA_WINDOW = 8


def _dma_kernel(n: int, B: int):
    """Raw row-permute: ONE program issues every (leaf, row) copy straight
    HBM->HBM through a rolling window of DMA semaphores — no VMEM staging,
    no per-program pipeline cost, and copies overlap across the DMA
    engines. Ablation (v5e, large-v3 seg-128 int8 cache, b8 k5, per step):
    BlockSpec pipeline 5.6 ms (640 VMEM-staged block-copies x ~8 us fixed);
    grid-(B,) raw DMA 3.2 ms (each program WAITS for its own copies — no
    cross-row overlap); this windowed form ~wire. Wire is 1.1 ms."""

    def kernel(rows_ref, *refs):
        ins, outs, sems = refs[:n], refs[n : 2 * n], refs[2 * n]

        def copy(i):
            j, l = divmod(i, n)
            return pltpu.make_async_copy(
                ins[l].at[pl.ds(rows_ref[j], 1)],
                outs[l].at[pl.ds(j, 1)],
                sems.at[i % _DMA_WINDOW],
            )

        total = B * n
        for i in range(total):
            if i >= _DMA_WINDOW:
                copy(i - _DMA_WINDOW).wait()
            copy(i).start()
        for i in range(max(0, total - _DMA_WINDOW), total):
            copy(i).wait()

    return kernel


def permute_rows_multi(arrays, rows: jnp.ndarray, interpret: bool | None = None):
    """[a[rows] for a in arrays] for (B, L, ...) arrays, one pallas_call.

    Every array must share B (axis 0); trailing dims are free. Each row of
    the batch-leading cache is one contiguous span, copied by a single
    HBM->HBM DMA per (leaf, row) in the array's own (carry) layout — no XLA
    layout reconciliation, no VMEM staging, no per-block pipeline overhead.
    """
    arrays = list(arrays)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret or any(a.shape[-1] % 128 for a in arrays):
        # Interpret mode (CPU tests) or unaligned minor dims: the
        # semantically-identical BlockSpec copy kernel. Raw HBM->HBM DMA
        # requires tile-aligned slices (Mosaic: "slice shape along the
        # minor dim must be aligned to tiling (128)"); production beam
        # caches are exact-sized (no 128 padding — the lane-dot path has
        # no alignment need), so standalone callers wanting the DMA route
        # must opt in via init_cache(pad_ctx=True).
        return _permute_rows_blocked(arrays, rows, interpret)
    n = len(arrays)
    B = arrays[0].shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in arrays],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in arrays],
        scratch_shapes=[pltpu.SemaphoreType.DMA((_DMA_WINDOW,))],
    )
    out = pl.pallas_call(
        _dma_kernel(n, B),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays],
    )(rows.astype(jnp.int32), *arrays)
    return list(out)


def _permute_rows_blocked(arrays, rows: jnp.ndarray, interpret: bool):
    """BlockSpec (VMEM-staged) variant: interpret mode + unaligned shapes."""
    B, L = arrays[0].shape[0], arrays[0].shape[1]
    lb = _choose_lb(arrays)

    def in_spec(a):
        trailing = a.shape[2:]
        zeros = (0,) * len(trailing)
        return pl.BlockSpec(
            (1, lb) + trailing,
            lambda j, li, rows: (rows[j], li) + zeros,
            memory_space=pltpu.VMEM,
        )

    def out_spec(a):
        trailing = a.shape[2:]
        zeros = (0,) * len(trailing)
        return pl.BlockSpec(
            (1, lb) + trailing,
            lambda j, li, rows: (j, li) + zeros,
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, L // lb),
        in_specs=[in_spec(a) for a in arrays],
        out_specs=[out_spec(a) for a in arrays],
    )
    out = pl.pallas_call(
        _kernel(len(arrays)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays],
        interpret=interpret,
    )(rows.astype(jnp.int32), *arrays)
    return list(out)


def _cow_kernel(n: int, B: int):
    """In-place sparse row copy: for each row i with ``src[i] != i``, DMA row
    ``src[i]`` over row ``i`` WITHIN the same buffers (inputs are aliased to
    the outputs). The copy-on-write beam reorder guarantees no source row is
    ever a destination row (sources are kept rows, destinations are freed
    rows), so the copies are conflict-free in any order and can overlap
    through a rolling semaphore window. Identity rows cost nothing — the
    whole call moves only the genuinely forked rows instead of the full
    cache, and the aliasing means XLA allocates no second buffer and copies
    no while-carry around the op."""

    def kernel(src_ref, *refs):
        ins, outs, sems = refs[:n], refs[n : 2 * n], refs[2 * n]

        def copy(i, l):
            return pltpu.make_async_copy(
                ins[l].at[pl.ds(src_ref[i], 1)],
                outs[l].at[pl.ds(i, 1)],
                sems.at[i % _DMA_WINDOW, l],
            )

        def start(i):
            @pl.when(src_ref[i] != i)
            def _():
                for l in range(n):
                    copy(i, l).start()

        def wait(i):
            @pl.when(src_ref[i] != i)
            def _():
                for l in range(n):
                    copy(i, l).wait()

        def body(i, carry):
            @pl.when(i >= _DMA_WINDOW)
            def _():
                wait(i - _DMA_WINDOW)

            start(i)
            return carry

        jax.lax.fori_loop(0, B, body, 0)

        def drain(i, carry):
            wait(i)
            return carry

        jax.lax.fori_loop(max(B - _DMA_WINDOW, 0), B, drain, 0)

    return kernel


def cow_rows_aligned(arrays) -> bool:
    """True when every leaf's minor dim meets the raw-DMA tile alignment
    (128 elements) — the condition for the in-place COW kernel."""
    return all(a.shape[-1] % 128 == 0 for a in arrays)


def cow_copy_rows(tree, src: jnp.ndarray):
    """Sparse in-place row copy over every leaf of a KV-cache pytree:
    leaf[i] <- leaf[src[i]] wherever ``src[i] != i``, identity elsewhere.

    ``src`` must satisfy the copy-on-write invariant (no value of ``src``
    may equal an index i where ``src[i] != i`` — i.e. sources are never
    destinations); the beam loop's ``cow_assign`` produces exactly this.
    On TPU with tile-aligned rows this is a single aliased pallas_call that
    moves only the forked rows; elsewhere it falls back to a full gather
    (``jnp.take``), which is semantically identical.
    """
    leaves, treedef = jax.tree.flatten(tree)
    if jax.default_backend() != "tpu" or not cow_rows_aligned(leaves):
        return jax.tree.unflatten(
            treedef, [jnp.take(a, src, axis=0) for a in leaves])
    n = len(leaves)
    B = leaves[0].shape[0]
    out = pl.pallas_call(
        _cow_kernel(n, B),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY) for _ in leaves],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in leaves],
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in leaves],
        scratch_shapes=[pltpu.SemaphoreType.DMA((_DMA_WINDOW, n))],
        input_output_aliases={1 + i: i for i in range(n)},
    )(src.astype(jnp.int32), *leaves)
    return jax.tree.unflatten(treedef, out)


def lane_dot_permute(tree, src: jnp.ndarray):
    """Batch-row cache gather as a one-hot dot on the transposed view:
    leaf[i] <- leaf[src[i]] (src need not be a bijection).

    The decode while-loop carries the KV cache batch-MINOR (codes layout
    {0,3,2,4,1}, scales {0,2,3,1} — decode attention vectorizes over batch
    lanes), and ANY custom call or gather op there pays full-cache layout
    reconciliation copies (matrix in decoding/device_beam.py). Transposing
    each leaf to the logical shape whose DEFAULT layout equals that physical
    layout — codes (L,C,H,D,B), scales (L,C,H,B) — makes the transpose a
    bitcast (XLA TransposeIsBitcast), and a (N,B)x(B,B) one-hot dot then
    reads and writes the cache in its native layout on the MXU. Exact for
    int8 codes (int32 accumulation) and f32/bf16 (single-term sums).

    If XLA picks a different carry layout for some config the transposes
    materialize and this degrades to a correct full gather — the identity
    cond in the beam loops still skips permutation-only steps.
    """
    leaves, treedef = jax.tree.flatten(tree)
    B = leaves[0].shape[0]
    S = src[None, :] == jnp.arange(B)[:, None]          # S[b, r]

    def leaf(a):
        if a.ndim == 5:      # codes/bf16 (B, L, H, D, C) -> (L, C, H, D, B)
            p = (1, 4, 2, 3, 0)
        elif a.ndim == 4:    # scales    (B, L, H, C)    -> (L, C, H, B)
            p = (1, 3, 2, 0)
        else:
            return jnp.take(a, src, axis=0)
        inv = tuple(int(i) for i in np.argsort(p))
        at = jnp.transpose(a, p)
        flat = at.reshape(-1, B)
        if a.dtype == jnp.int8:
            out = jax.lax.dot_general(
                flat, S.astype(jnp.int8), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.int8)
        else:
            out = jax.lax.dot_general(
                flat, S.astype(a.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(a.dtype)
        return jnp.transpose(out.reshape(at.shape), inv)

    return jax.tree.unflatten(treedef, [leaf(a) for a in leaves])


def layer_dot_permute(tree, src: jnp.ndarray):
    """Batch-row cache gather as a one-hot dot on the LAYER-MAJOR view:
    leaf[i] <- leaf[src[i]] (src need not be a bijection).

    The beam ENGINE's decode chunk (parallel/beam_engine._decode_chunk_beam)
    carries the int8 cache in layout {3,2,4,0,1} — minor-to-major
    (D, H, C, B, L), i.e. LAYER-major with batch second (scales
    {2,3,0,1} = (H, C, B, L)) — because the layer scan slices axis 1 every
    step. That is neither the batch-minor layout the lockstep while_loop
    carries (lane_dot_permute's target) nor default, so both jnp.take and
    lane_dot pay full-cache relayout copies there (measured 27 ms/step over
    the no-cow floor at 165 rows int8 ctx104, scripts/bisect_beam_chunk.py).

    Transposing each leaf to the logical shape whose DEFAULT layout equals
    that physical layout — codes (L, B, C, H, D), scales (L, B, C, H) —
    elides to a bitcast, and an L-batched (B,B)x(B, C*H*D) one-hot dot then
    streams the cache once through the MXU in its native layout: the read
    rides the ~617 GB/s int8-operand path instead of gather/scatter
    lowering. Exact for int8 codes (int32 accumulation) and f32/bf16
    (single-term sums).

    MEASURED NEGATIVE in the engine chunk it was built for (v5e, 165 rows
    int8 ctx104, scripts/bisect_beam_chunk.py `layerdot`): 72.8 ms/step vs
    the fused per-layer permute's 58.6 (floor 30.1) — replacing the fused
    permute changes which ops touch the carry, XLA's layout assignment
    re-optimizes, and the hardcoded transposed view materializes. The
    general lesson (5th failed variant): ANY loop-level reorder of the
    multi-GB pool pays full-buffer materialization, and the layout chooser
    cannot be pinned against it. Kept as the recorded experiment.

    If XLA picks a different carry layout for some config the transposes
    materialize and this degrades to a correct full gather.
    """
    leaves, treedef = jax.tree.flatten(tree)
    B = leaves[0].shape[0]
    S = (src[:, None] == jnp.arange(B)[None, :])        # S[b, r]: out b <- r

    def leaf(a):
        if a.ndim == 5:      # codes/bf16 (B, L, H, D, C) -> (L, B, C, H, D)
            p = (1, 0, 4, 2, 3)
        elif a.ndim == 4:    # scales    (B, L, H, C)    -> (L, B, C, H)
            p = (1, 0, 3, 2)
        else:
            return jnp.take(a, src, axis=0)
        inv = tuple(int(i) for i in np.argsort(p))
        at = jnp.transpose(a, p)
        L = at.shape[0]
        flat = at.reshape(L, B, -1)
        Sb = jnp.broadcast_to(S.astype(
            jnp.int8 if a.dtype == jnp.int8 else a.dtype), (L, B, B))
        if a.dtype == jnp.int8:
            out = jax.lax.dot_general(
                Sb, flat, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.int8)
        else:
            out = jax.lax.dot_general(
                Sb, flat, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(a.dtype)
        return jnp.transpose(out.reshape(at.shape), inv)

    return jax.tree.unflatten(treedef, [leaf(a) for a in leaves])


def permute_rows(x: jnp.ndarray, rows: jnp.ndarray,
                 interpret: bool | None = None) -> jnp.ndarray:
    """x[rows] for a single (B, L, ...) array (see permute_rows_multi)."""
    return permute_rows_multi([x], rows, interpret=interpret)[0]


def permute_cache_rows(tree, rows: jnp.ndarray):
    """Permute every leaf of a KV-cache pytree (plain or QuantKV) along the
    leading batch axis in ONE fused pallas_call."""
    leaves, treedef = jax.tree.flatten(tree)
    return jax.tree.unflatten(treedef, permute_rows_multi(leaves, rows))
