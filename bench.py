"""Headline benchmark: connect-four self-play throughput on one TPU chip.

Flagship configuration (= the reference's, ``games/connect-four/params.jl``):
ResNet-5x128 policy/value net, 600 MCTS simulations per move.  Metric is
self-play samples (moves) generated per second, compared against the
reference baseline of 52 samples/s on an RTX 2070
(``/root/reference/scripts/profile/self_play.jl:75-79``; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_SAMPLES_PER_S = 52.0  # reference, 128 filters, RTX 2070

# bf16 peak matmul throughput per chip, by jax device_kind prefix.  Sources:
# public TPU spec sheets (v5e 197 TFLOP/s bf16, v5p 459, v4 275, v6e 918).
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p ("TPU v5" without "lite")
    "TPU v4": 275e12,
    "TPU v6": 918e12,
    "TPU v6 lite": 918e12,
}


def _device_peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "")
    # longest matching prefix wins ("TPU v5 lite" before "TPU v5")
    best = None
    for k, v in PEAK_BF16_FLOPS.items():
        if kind.startswith(k) and (best is None or len(k) > best[0]):
            best = (len(k), v)
    return best[1] if best else None


def main():
    num_lanes = int(os.environ.get("BENCH_LANES", "1024"))
    num_sims = int(os.environ.get("BENCH_SIMS", "600"))
    moves = int(os.environ.get("BENCH_MOVES", "8"))
    # experiment knobs (unset = the flagship self-play production defaults:
    # max_depth=16 matches experiments/connect_four.py — ablation-validated
    # strength-neutral; with the one-hot descent lookup (MCTSConfig.gather
    # default) 830 -> 1027 samples/s; BENCH_MAX_DEPTH=0 disables)
    knobs = {}
    if "BENCH_UPDATE" in os.environ:
        knobs["update"] = os.environ["BENCH_UPDATE"]
    md = int(os.environ.get("BENCH_MAX_DEPTH", "16"))
    if md:
        knobs["max_depth"] = md
    if "BENCH_STAGES" in os.environ:
        knobs["stages"] = int(os.environ["BENCH_STAGES"])
    if "BENCH_GATHER" in os.environ:
        knobs["gather"] = os.environ["BENCH_GATHER"]
    if "BENCH_DESCENT" in os.environ:
        knobs["descent"] = os.environ["BENCH_DESCENT"]
    if "BENCH_DESCENT_MIN_CAP" in os.environ:
        knobs["descent_min_cap"] = int(os.environ["BENCH_DESCENT_MIN_CAP"])

    from alphazero_tpu.envs import registry
    from alphazero_tpu.models import ResNetSpec
    from alphazero_tpu.models.interface import Network
    from alphazero_tpu.search import mcts
    from alphazero_tpu.envs import core as envcore

    game = registry()["connect-four"]
    spec = ResNetSpec(num_filters=128, num_blocks=5,
                      num_policy_head_filters=32, num_value_head_filters=32,
                      batch_norm_momentum=0.1, compute_dtype="bfloat16")
    network = Network(game, spec)
    net = network.init(jax.random.key(0))
    cfg = mcts.MCTSConfig(num_sims=num_sims, cpuct=2.0, dirichlet_eps=0.25,
                          dirichlet_alpha=1.0, **knobs)

    def oracle(states, obs, mask):
        p, _, v, _ = network.forward_normalized(net, obs, mask)
        return p, v

    @jax.jit
    def play_moves(states, rng):
        """`moves` search+step cycles over the lane batch (self-play core)."""
        def body(carry, key):
            s = carry
            k1, k2, k3 = jax.random.split(key, 3)
            res = mcts.search(game, oracle, s, k1, cfg)
            a = jax.vmap(envcore.sample_from)(
                res.policy, jax.random.split(k2, num_lanes))
            done = jax.vmap(game.terminated)(s)
            s2 = jax.vmap(game.step)(s, a, jax.random.split(k3, num_lanes))
            s2 = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
                s2, s)
            return s2, jnp.sum(~done)
        states, counts = jax.lax.scan(
            body, states, jax.random.split(rng, moves))
        return states, jnp.sum(counts)

    # chip-integrity canary: refuse to produce a headline number on a
    # miscompiling worker (raises CanaryError; NOTES.md round-3 faults)
    from alphazero_tpu.utils import canary as canarymod
    canary = canarymod.summary(canarymod.validate_chip())
    print(f"# canary: {canary}", file=sys.stderr)

    s0 = game.init_batch(num_lanes)
    # warmup/compile
    t0 = time.perf_counter()
    _, n = play_moves(s0, jax.random.key(1))
    jax.block_until_ready(n)
    compile_and_first = time.perf_counter() - t0
    # timed run
    t0 = time.perf_counter()
    _, n = play_moves(s0, jax.random.key(2))
    n = int(jax.block_until_ready(n))
    elapsed = time.perf_counter() - t0
    samples_per_s = n / elapsed

    # MFU: model FLOPs per generated sample / device bf16 peak.  Each search
    # runs num_sims leaf evaluations over all lanes plus the root evaluation,
    # so one sample (move) costs (num_sims + 1) network forwards.  FLOPs per
    # forward come from XLA's own cost model on the jitted forward at the
    # production batch width (counts the MXU matmul/conv work; excludes the
    # tree-descent overhead, which is the convention for *model* FLOPs
    # utilisation).  Peak: PEAK_BF16_FLOPS by device kind.
    fwd = jax.jit(lambda o, m: network.forward_normalized(net, o, m))
    obs = jax.vmap(game.observe)(s0)
    mask = jax.vmap(game.legal_mask)(s0)
    cost = fwd.lower(obs, mask).compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    flops_per_fwd = float(cost.get("flops", 0.0)) / num_lanes
    peak = _device_peak_flops(jax.devices()[0])
    evals_per_sample = num_sims + 1
    model_flops_per_s = samples_per_s * evals_per_sample * flops_per_fwd
    mfu = (model_flops_per_s / peak) if (peak and flops_per_fwd > 0) else None
    print(f"# mfu: flops/fwd={flops_per_fwd/1e6:.1f}M x "
          f"{evals_per_sample} evals/sample x {samples_per_s:.0f} samples/s"
          f" = {model_flops_per_s/1e12:.1f} TFLOP/s model compute; "
          f"peak={peak/1e12:.0f}T" if peak else "# mfu: unknown device peak",
          file=sys.stderr)
    print(json.dumps({
        "metric": "selfplay_samples_per_s_c4_resnet5x128_600sims",
        "value": round(samples_per_s, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / BASELINE_SAMPLES_PER_S, 2),
        "mfu": round(mfu, 4) if mfu is not None else None,
    }))
    print(f"# lanes={num_lanes} sims={num_sims} moves={moves} "
          f"samples={n} elapsed={elapsed:.1f}s "
          f"first_call={compile_and_first:.1f}s device={jax.devices()[0]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
