"""Decision-grade on-chip A/B of the MCTS descent formulations.

The third-round perf carry (VERDICT r2-r4): the Pallas descent kernel
(``ops/fused_mcts.pallas_select``) projects ~1200 samples/s end-to-end but
requires the lanes-minor ``[N, W, B]`` slab layout, while production trees
are ``[N, B, W]``.  Landing it means flipping the whole tree layout; this
script produces the numbers that decide whether that refactor is worth it:

1. on-chip BIT-PARITY of pallas_select vs the XLA ``_select`` (the kernel
   had only ever run in interpret mode before round 5);
2. per-descent cost of the XLA one-hot ``_select`` at flagship shapes;
3. per-descent cost of pallas_select on pre-transposed slabs (kernel-native
   layout, transpose excluded — the production cost after a layout flip);
4. the transpose cost itself, made un-elidable by ``optimization_barrier``
   (what a NON-flipped integration would pay per sim).

Flagship shape: B=1024 lanes, c4 (ap=8), ResNet tree at N=601 (stages=1
so the full slab participates, the worst case for the XLA re-streaming
formulation and the best case for the kernel's one-pass staging).

Usage:
    python -m alphazero_tpu.scripts.profile_select [--lanes 1024]
        [--sims 600] [--max-depth 16] [--reps 50]
"""

from __future__ import annotations

import argparse
import time


def _bench(fn, args, reps):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=1024)
    ap.add_argument("--sims", type=int, default=600)
    ap.add_argument("--max-depth", type=int, default=16)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..envs import registry
    from ..models import ResNetSpec
    from ..models.interface import Network
    from ..ops import fused_mcts as FM
    from ..search import mcts as M

    game = registry()["connect-four"]
    B, A = args.lanes, game.num_actions
    ap_ = M._pad_width(A)
    spec = ResNetSpec(num_filters=128, num_blocks=5,
                      num_policy_head_filters=32, num_value_head_filters=32,
                      batch_norm_momentum=0.1,
                      compute_dtype="bfloat16").inference_spec()
    network = Network(game, spec)
    net = network.init(jax.random.key(0))

    def oracle(states, obs, mask):
        p, _, v, _ = network.forward_normalized(net, obs, mask)
        return p, v

    # a real mid-search flagship tree: full capacity slab (stages=1)
    cfg = M.MCTSConfig(num_sims=args.sims, cpuct=2.0, dirichlet_eps=0.25,
                       dirichlet_alpha=1.0, stages=1,
                       max_depth=args.max_depth)
    states = game.init_batch(B)
    print(f"building tree: B={B} sims={args.sims} (first jit is slow)...",
          flush=True)
    res = jax.jit(lambda s, k: M.search(game, oracle, s, k, cfg))(
        states, jax.random.key(7))
    tree = jax.block_until_ready(res.tree)
    N = tree.stats.shape[0]
    D = args.max_depth
    eta = jnp.zeros((B, A), jnp.float32)
    print(f"tree: N={N} slabs stats{tree.stats.shape} "
          f"pl{tree.prior_legal.shape} meta{tree.meta.shape}", flush=True)

    # ---- correctness on THIS backend: kernel vs XLA descent -------------
    sel = jax.jit(lambda t: M._select(t, eta, cfg, D, A))(tree)
    # since the round-5 layout flip the tree is already lanes-minor
    stats_t, pl_t, meta_t = tree.stats, tree.prior_legal, tree.meta

    # variant 1 (the designed config): 128-lane blocks, grid-pipelined.
    # At flagship N the block is 14.8 MB — needs a raised scoped-VMEM
    # limit (XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=...)
    def kernel_grid(s, p, m):
        return FM.pallas_select(s, p, m, eta.T, max_depth=D,
                                cpuct=cfg.cpuct, eps=cfg.dirichlet_eps,
                                interpret=False, lanes_per_block=128)

    # variant 2: chunk the batch, one grid-1 kernel call per 128 lanes
    # (block = full array: fits the default scoped-VMEM limit unbuffered)
    CH = 128

    @jax.jit
    def kernel_chunked(s, p, m):
        outs = [FM.pallas_select(
            s[:, :, i:i + CH], p[:, :, i:i + CH], m[:, :, i:i + CH],
            eta.T[:, i:i + CH], max_depth=D, cpuct=cfg.cpuct,
            eps=cfg.dirichlet_eps, interpret=False, lanes_per_block=CH)
            for i in range(0, B, CH)]
        return FM.SelectOut(*[jnp.concatenate(xs, 0)
                              for xs in zip(*outs)])

    grid_ok = True
    try:
        # the 29.5 MB double-buffered working set needs a raised
        # scoped-VMEM cap; pass it per-compile (XLA_FLAGS would crash the
        # local CPU-XLA flag parser, which doesn't know TPU-only flags)
        kernel_grid = (
            jax.jit(kernel_grid)
            .lower(stats_t, pl_t, meta_t)
            .compile(compiler_options={
                "xla_tpu_scoped_vmem_limit_kib": "65536"}))
        out = jax.block_until_ready(kernel_grid(stats_t, pl_t, meta_t))
    except Exception as exc:
        grid_ok = False
        print(f"grid-pipelined kernel unavailable: "
              f"{str(exc).splitlines()[0][:160]}", flush=True)
        out = kernel_chunked(stats_t, pl_t, meta_t)
    ok = True
    for name, a, b in [
            ("expand_parent", sel.expand_parent, out.expand_parent),
            ("expand_action", sel.expand_action, out.expand_action),
            ("depth", sel.depth, out.depth),
            ("path_nodes", jnp.where(
                jnp.arange(D)[None] < sel.depth[:, None],
                sel.path_nodes, -1),
             jnp.where(jnp.arange(D)[None] < out.depth[:, None],
                       out.path_nodes, -1)),
            ("r_edges", jnp.where(
                jnp.arange(D)[None] < sel.depth[:, None], sel.path_r, 0.0),
             jnp.where(jnp.arange(D)[None] < out.depth[:, None],
                       out.r_edges, 0.0))]:
        av, bv = np.asarray(a), np.asarray(b)
        n_bad = int((av != bv).sum())
        if n_bad:
            ok = False
            print(f"  PARITY FAIL {name}: {n_bad} mismatching entries")
    print(f"on-chip kernel parity vs XLA _select: {'PASS' if ok else 'FAIL'}"
          f" (backend={jax.default_backend()}, "
          f"device={jax.devices()[0].device_kind})", flush=True)

    # ---- timings --------------------------------------------------------
    t_xla = _bench(jax.jit(lambda t: M._select(t, eta, cfg, D, A)),
                   (tree,), args.reps)

    t_grid = (_bench(kernel_grid, (stats_t, pl_t, meta_t),
                     args.reps) if grid_ok else float("nan"))
    try:
        kernel_chunked = (
            kernel_chunked.lower(stats_t, pl_t, meta_t)
            .compile(compiler_options={
                "xla_tpu_scoped_vmem_limit_kib": "65536"}))
        t_chunk = _bench(kernel_chunked, (stats_t, pl_t, meta_t),
                         args.reps)
    except Exception as exc:
        print(f"chunked kernel unavailable: "
              f"{str(exc).splitlines()[0][:160]}", flush=True)
        t_chunk = float("nan")
    t_kernel = min((x for x in (t_grid, t_chunk) if x == x),
                   default=float("nan"))

    # transpose cost a NON-flipped integration would pay each sim; the
    # barrier pins both operand and result so XLA cannot fuse it away
    @jax.jit
    def transpose_all(s, p, m):
        s, p, m = jax.lax.optimization_barrier((s, p, m))
        return jax.lax.optimization_barrier(
            (jnp.transpose(s, (0, 2, 1)), jnp.transpose(p, (0, 2, 1)),
             jnp.transpose(m, (0, 2, 1))))
    t_transpose = _bench(transpose_all,
                         (tree.stats, tree.prior_legal, tree.meta),
                         args.reps)

    slab_mb = sum(x.size * x.dtype.itemsize
                  for x in (tree.stats, tree.prior_legal, tree.meta)) / 2**20
    print(f"\nper-descent cost at N={N} B={B} D={D} "
          f"(slabs {slab_mb:.1f} MB, reps={args.reps}):")
    print(f"  XLA one-hot _select   : {1e3 * t_xla:8.3f} ms")
    print(f"  pallas grid-pipelined : {1e3 * t_grid:8.3f} ms")
    print(f"  pallas chunked (B=128): {1e3 * t_chunk:8.3f} ms")
    print(f"  slab transpose (x3)   : {1e3 * t_transpose:8.3f} ms")
    dps = t_xla - t_kernel
    print(f"  kernel saving/sim     : {1e3 * dps:8.3f} ms "
          f"({'kernel wins' if dps > 0 else 'XLA wins'})")
    # end-to-end projection: descent saving x sims relative to the
    # measured production rate
    per_move_saving = dps * args.sims
    print(f"  projected saving/move : {per_move_saving:8.3f} s "
          f"(x{args.sims} sims; production move "
          f"~{args.sims / 600:.1f}x0.99s at 1035 samples/s x {B} lanes)")
    return dict(t_xla=t_xla, t_kernel=t_kernel, t_transpose=t_transpose,
                parity=ok)


if __name__ == "__main__":
    main()
