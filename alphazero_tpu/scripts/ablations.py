"""Equal-budget strength ablations for search variants, using a trained net.

Head-to-head duels of the SAME network under different search configs —
the validation protocol for performance knobs that extend the reference
semantics (``MCTSConfig.max_depth``, ``MCTSConfig.reuse_tree``,
``algorithm="gumbel"``):  a knob is safe to enable in the flagship recipe
iff it does not lose strength at an equal simulation budget (and wins
wall-clock).

Usage:
    python -m alphazero_tpu.scripts.ablations sessions/c4-flagship \
        [--sims 600] [--games 128] [--ablation all|depth|reuse|gumbel]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--sims", type=int, default=600)
    ap.add_argument("--games", type=int, default=128)
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--ablation", default="all",
                    choices=["all", "depth", "reuse", "gumbel"])
    ap.add_argument("--max-depth", type=int, default=24)
    ap.add_argument("--gumbel-sims", type=int, default=None,
                    help="budget for the gumbel side (default: --sims/4)")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from .. import arena as A
    from ..config import SimParams
    from ..experiments import connect_four
    from ..session import Session

    exp = connect_four.experiment()
    sess = Session(exp, dir=args.dir, autosave=False, quiet=True)
    env = sess.env
    print(f"Loaded {args.dir} at iteration {env.itc}")
    base_mcts = exp.params.arena.mcts.replace(num_iters_per_turn=args.sims)
    sim = SimParams(num_games=args.games, num_lanes=args.lanes,
                    flip_probability=0.5, alternate_colors=True)
    rng = jax.random.key(123)

    def duel(name, mcts_a, mcts_b, sims_note=""):
        nonlocal rng
        rng, sub = jax.random.split(rng)
        res = A.play_duel(env.game, env.netspec, A.Full(mcts_a),
                          A.Full(mcts_b), sim, env.bestnn, env.bestnn, sub)
        r = np.asarray(res.rewards)
        w, d, l = A.ternary_stats(r)
        print(f"{name}{sims_note}: avgr {r.mean():+.3f}  "
              f"won/draw/lost {w}/{d}/{l}")

    if args.ablation in ("all", "depth"):
        duel(f"max_depth={args.max_depth} vs uncapped",
             base_mcts.replace(max_depth=args.max_depth), base_mcts)
    if args.ablation in ("all", "reuse"):
        _reuse_duel(env, base_mcts, args, rng)
    if args.ablation in ("all", "gumbel"):
        gs = args.gumbel_sims or max(2, args.sims // 4)
        duel("gumbel vs puct",
             base_mcts.replace(algorithm="gumbel", num_iters_per_turn=gs),
             base_mcts, sims_note=f" ({gs} vs {args.sims} sims)")


def _reuse_duel(env, base_mcts, args, rng):
    """Reuse-vs-fresh duel with the carry threaded through the episode (the
    generic duel program searches each move from scratch, so ``reuse_tree``
    needs its own loop; pattern from tests/test_reuse.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .. import arena as A
    from ..envs import core
    from ..models.interface import Network
    from ..search import mcts as M

    game = env.game
    network = Network(game, env.netspec.inference_spec())
    net = env.bestnn
    B, K = args.lanes, base_mcts.reuse_cap
    rcfg = A.mcts_config(base_mcts.replace(reuse_tree=True))
    fcfg = A.mcts_config(base_mcts)
    tau = base_mcts.temperature

    def oracle(states, obs, mask):
        p, _, v, _ = network.forward_normalized(net, obs, mask)
        return p, v

    @jax.jit
    def play_match(key, reuse_is_white):
        ctree, cvalid = M.empty_carry(game, K, B)

        def body(carry, inp):
            turn, k = inp
            states, ctree, cvalid = carry
            k1, k2, k3 = jax.random.split(k, 3)
            done = jax.vmap(game.terminated)(states)
            white_turn = jax.vmap(game.to_play)(states) == core.WHITE
            reuse_turn = white_turn == reuse_is_white
            stored_key = jax.vmap(game.canonical_key)(
                jax.tree.map(lambda x: x[0], ctree.states))
            cur_key = jax.vmap(game.canonical_key)(states)
            cvalid = cvalid & jnp.all(stored_key == cur_key, axis=-1)
            rres = M.search(game, oracle, states, k1, rcfg,
                            carried=(ctree, cvalid))
            fres = M.search(game, oracle, states,
                            jax.random.fold_in(k1, 7), fcfg)
            t = tau(turn)
            pi = jnp.where(reuse_turn[:, None],
                           core.apply_temperature(rres.policy, t),
                           core.apply_temperature(fres.policy, t))
            a = jax.vmap(core.sample_from)(pi, jax.random.split(k2, B))
            ctree, cvalid = M.advance_root(game, rres.tree, a, K)
            cvalid = cvalid & ~done
            s2 = jax.vmap(game.step)(states, a, jax.random.split(k3, B))
            s2 = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
                s2, states)
            rew = jnp.where(done, 0.0, jax.vmap(game.reward)(s2))
            return (s2, ctree, cvalid), rew

        (_, _, _), rews = jax.lax.scan(
            body, (game.init_batch(B), ctree, cvalid),
            (jnp.arange(game.max_game_length),
             jax.random.split(key, game.max_game_length)))
        tw = rews.sum(0)
        return jnp.where(reuse_is_white, tw, -tw)

    rng, k1, k2 = jax.random.split(rng, 3)
    r = np.concatenate([np.asarray(play_match(k1, True)),
                        np.asarray(play_match(k2, False))])
    w, d, l = A.ternary_stats(r)
    print(f"reuse_tree vs fresh trees: avgr {r.mean():+.3f}  "
          f"won/draw/lost {w}/{d}/{l}")


if __name__ == "__main__":
    main()
