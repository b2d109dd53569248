"""On-chip bisection of the TPU-scale subtree-reuse anomaly (NOTES.md).

Symptom: at flagship arena scale (S=600, K=256, B=128, trained net) the
``reuse_tree`` side of the equal-budget duel loses 0/256 on TPU, while every
CPU reproduction at smaller shapes wins.  This script separates the two
confounded axes (platform, shape) with bit-parity checks of the reuse
machinery between TPU and CPU at the exact failing shapes, plus a
configurable rollout-oracle duel to bisect S/K/B on-chip without the net.

Subcommands:

    parity [--sims 600] [--cap 256] [--lanes 128]
        1. build a flagship-shape tree (TPU, random oracle, noise-free);
        2. advance_root on TPU vs CPU from the identical tree -> bit-compare;
        3. _install_carried parity;
        4. warm-started search (deterministic cfg) root_visits TPU vs CPU;
        5. TPU dense-update vs TPU scatter-update warm search.

    duel --sims S --cap K --lanes B [--oracle rollout|random|net --dir DIR]
        reuse-vs-fresh equal-budget duel (the ablations.py protocol) with a
        configurable oracle, for shape bisection on-chip.
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import core
from ..envs import registry
from ..search import mcts as M


def _cpu():
    return jax.devices("cpu")[0]


def _to(dev, tree):
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev), tree)


def _cmp(name, a, b, exact=True):
    a = jax.tree.map(np.asarray, a)
    b = jax.tree.map(np.asarray, b)
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    bad = 0
    for x, y in zip(la, lb):
        if exact:
            neq = (x != y)
        else:
            neq = ~np.isclose(x, y, rtol=1e-5, atol=1e-5)
        bad += int(neq.sum())
        if neq.any():
            idx = tuple(z[0] for z in np.nonzero(neq))
            print(f"  [{name}] MISMATCH shape={x.shape} count={neq.sum()} "
                  f"first@{idx}: {x[idx]} vs {y[idx]}")
    print(f"[{name}] {'OK (bit-identical)' if bad == 0 else f'FAILED ({bad} elems)'}")
    return bad == 0


def cmd_parity(args):
    game = registry()["connect-four"]
    B, K, S = args.lanes, args.cap, args.sims
    oracle = M.random_oracle(game)
    # deterministic search: no dirichlet noise; random oracle is state-pure
    cfg = M.MCTSConfig(num_sims=S, cpuct=2.0, dirichlet_eps=0.0,
                       update=args.update, stages=args.stages)
    roots = game.init_batch(B)
    key = jax.random.key(5)

    print(f"== building flagship-shape tree on {jax.default_backend()} "
          f"(S={S}, B={B}) ==")
    res = jax.jit(functools.partial(M.search, game, oracle, cfg=cfg))(
        roots=roots, rng=key)
    tree = jax.block_until_ready(res.tree)
    # a realistic played action per lane
    actions = jnp.argmax(res.policy, -1).astype(jnp.int32)
    print(f"tree built: capacity={tree.meta.shape[0]}, "
          f"root visits sum={np.asarray(res.root_visits).sum(-1)[:4]}")

    adv = jax.jit(functools.partial(M.advance_root, game, carry_cap=K))
    car_t, val_t = jax.block_until_ready(adv(tree=tree, actions=actions))
    with jax.default_device(_cpu()):
        car_c, val_c = jax.block_until_ready(
            adv(tree=_to(_cpu(), tree), actions=jax.device_put(
                np.asarray(actions), _cpu())))
    ok = _cmp("advance_root.valid", val_t, val_c)
    ok &= _cmp("advance_root.tree", car_t, car_c)

    # _install_carried parity on a fresh init
    def inst(roots, car, val):
        rp, rv = oracle(roots, jax.vmap(game.observe)(roots),
                        jax.vmap(game.legal_mask)(roots))
        t0 = M.init_tree(game, cfg, roots, rp, rv, capacity=K + 31)
        return M._install_carried(t0, car, val)

    s2 = jax.vmap(game.step)(roots, actions,
                             jax.random.split(jax.random.key(1), B))
    inst_t = jax.block_until_ready(jax.jit(inst)(s2, car_t, val_t))
    with jax.default_device(_cpu()):
        inst_c = jax.block_until_ready(jax.jit(inst)(
            _to(_cpu(), s2), car_c, val_c))
    ok &= _cmp("install_carried", inst_t, inst_c)

    # warm-started search: integer visit counts TPU vs CPU.  float argmax
    # ties can flip selections between platforms, so report divergence
    # magnitude rather than asserting bit equality.
    wcfg = M.MCTSConfig(num_sims=args.warm_sims, cpuct=2.0, dirichlet_eps=0.0,
                        update=args.update, stages=1)
    warm = jax.jit(functools.partial(M.search, game, oracle, cfg=wcfg))
    wt = jax.block_until_ready(
        warm(roots=s2, rng=jax.random.key(7), carried=(car_t, val_t)))
    with jax.default_device(_cpu()):
        wc = jax.block_until_ready(
            warm(roots=_to(_cpu(), s2), rng=jax.random.key(7),
                 carried=(car_c, val_c)))
    vt, vc = np.asarray(wt.root_visits), np.asarray(wc.root_visits)
    diff = np.abs(vt - vc).sum(-1)
    print(f"[warm search] visit L1 diff: mean {diff.mean():.2f}, "
          f"max {diff.max()}, lanes differing {(diff > 0).sum()}/{B}")
    qt, qc = np.asarray(wt.root_q), np.asarray(wc.root_q)
    print(f"[warm search] root_q max abs diff: {np.abs(qt - qc).max():.2e}")

    # TPU dense vs TPU scatter (same platform, isolates the update op)
    for upd in ("dense", "scatter"):
        if upd == args.update:
            continue
        import dataclasses as _dc
        w2cfg = _dc.replace(wcfg, update=upd)
        w2 = jax.block_until_ready(jax.jit(functools.partial(
            M.search, game, oracle, cfg=w2cfg))(
                roots=s2, rng=jax.random.key(7), carried=(car_t, val_t)))
        v2 = np.asarray(w2.root_visits)
        d2 = np.abs(vt - v2).sum(-1)
        print(f"[warm {args.update} vs {upd} on TPU] visit L1 diff: "
              f"mean {d2.mean():.2f}, max {d2.max()}, "
              f"lanes {(d2 > 0).sum()}/{B}")
    print("parity done.")


def cmd_duel(args):
    game = registry()["connect-four"]
    B, K, S = args.lanes, args.cap, args.sims

    if args.oracle == "net":
        from ..models.interface import Network
        from ..session import Session
        from ..experiments import connect_four
        sess = Session(connect_four.experiment(), dir=args.dir,
                       autosave=False, quiet=True)
        network = Network(game, sess.env.netspec.inference_spec())
        net = sess.env.bestnn

        def oracle(states, obs, mask):
            p, _, v, _ = network.forward_normalized(net, obs, mask)
            return p, v
    elif args.oracle == "rollout":
        net = None
        oracle = M.rollout_oracle(game)
    else:
        net = None
        oracle = M.random_oracle(game)

    rcfg = M.MCTSConfig(num_sims=S, cpuct=2.0, dirichlet_eps=0.25,
                        dirichlet_alpha=1.0, reuse_tree=True, reuse_cap=K,
                        update=args.update, stages=args.stages)
    fcfg = M.MCTSConfig(num_sims=S, cpuct=2.0, dirichlet_eps=0.25,
                        dirichlet_alpha=1.0, update=args.update,
                        stages=args.stages)

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
            ap = ctree.prior_legal.shape[1] // 2
            pre_visits = jnp.where(
                cvalid[:, None],
                ctree.stats[0, ap:ap + game.num_actions, :].T, 0.0)
            rres = M.search(game, oracle, states, k1, rcfg,
                            carried=(ctree, cvalid))
            fres = M.search(game, oracle, states,
                            jax.random.fold_in(k1, 7), fcfg)
            if args.policy == "fresh":
                # final policy from THIS move's simulations only: carried
                # visits guide the search but don't vote
                fresh_v = jnp.maximum(
                    rres.root_visits.astype(jnp.float32) - pre_visits, 0.0)
                rpolicy = fresh_v / jnp.maximum(
                    fresh_v.sum(-1, keepdims=True), 1.0)
            else:
                rpolicy = rres.policy
            tau = jnp.where(turn < 6, 1.0, 1e-3)
            pi = jnp.where(reuse_turn[:, None],
                           core.apply_temperature(rpolicy, tau),
                           core.apply_temperature(fres.policy, tau))
            a = jax.vmap(core.sample_from)(pi, jax.random.split(k2, B))
            ctree, cvalid = M.advance_root(game, rres.tree, a, K)
            if args.decay < 1.0:
                # decay carried qsum/visits (keep child pointers): carried
                # structure + priors persist, the stale vote shrinks
                ap2 = ctree.prior_legal.shape[1] // 2
                st = ctree.stats
                st = st.at[:, :2 * ap2, :].multiply(args.decay)
                ctree = ctree._replace(stats=st)
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

    rng = jax.random.key(args.seed)
    k1, k2 = jax.random.split(rng)
    r1 = np.asarray(play_match(k1, True))
    print(f"reuse as white: avgr {r1.mean():+.3f}  "
          f"w/d/l {(r1 > 0).sum()}/{(r1 == 0).sum()}/{(r1 < 0).sum()}")
    r2 = np.asarray(play_match(k2, False))
    print(f"reuse as black: avgr {r2.mean():+.3f}  "
          f"w/d/l {(r2 > 0).sum()}/{(r2 == 0).sum()}/{(r2 < 0).sum()}")
    r = np.concatenate([r1, r2])
    print(f"TOTAL S={S} K={K} B={B} oracle={args.oracle} "
          f"update={args.update} stages={args.stages}: "
          f"avgr {r.mean():+.3f}  w/d/l "
          f"{(r > 0).sum()}/{(r == 0).sum()}/{(r < 0).sum()}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("parity")
    p.add_argument("--sims", type=int, default=600)
    p.add_argument("--warm-sims", type=int, default=64)
    p.add_argument("--cap", type=int, default=256)
    p.add_argument("--lanes", type=int, default=128)
    p.add_argument("--update", default="dense")
    p.add_argument("--stages", type=int, default=6)
    p.set_defaults(fn=cmd_parity)
    d = sub.add_parser("duel")
    d.add_argument("--sims", type=int, default=600)
    d.add_argument("--cap", type=int, default=256)
    d.add_argument("--lanes", type=int, default=128)
    d.add_argument("--oracle", default="rollout",
                   choices=["rollout", "random", "net"])
    d.add_argument("--dir", default="sessions/c4-flagship")
    d.add_argument("--update", default="dense")
    d.add_argument("--stages", type=int, default=6)
    d.add_argument("--seed", type=int, default=11)
    d.add_argument("--policy", default="total", choices=["total", "fresh"])
    d.add_argument("--decay", type=float, default=1.0,
                   help="multiplier on carried qsum/visits per move")
    d.set_defaults(fn=cmd_duel)
    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
