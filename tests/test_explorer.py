"""Explorer REPL: field-for-field parity with the reference's state
statistics (``/root/reference/src/ui/explorer.jl:9-116``) and its command
set (``explorer.jl:192-250``)."""

import jax
import numpy as np
import pytest

from alphazero_tpu.config import MctsParams
from alphazero_tpu.envs import registry
from alphazero_tpu.models import SimpleNetSpec
from alphazero_tpu.models.interface import Network
from alphazero_tpu.session.explorer import Explorer


@pytest.fixture(scope="module")
def ttt_explorer():
    game = registry()["tictactoe"]
    spec = SimpleNetSpec(width=16, depth_common=1)
    net = Network(game, spec).init(jax.random.key(0))
    return Explorer(game, spec, net,
                    MctsParams(num_iters_per_turn=16, cpuct=1.0))


def test_statistics_columns_match_reference(ttt_explorer):
    """The per-action table carries the reference's full column set
    (``StateActionStats``, ``explorer.jl:9-17``) and is sorted by P
    (``explorer.jl:113``); state-level stats match ``StateStats``."""
    rows, info = ttt_explorer.state_statistics()
    assert rows, "empty board has 9 legal actions"
    for col in ("action", "P", "Pnet", "Pmcts", "Qmcts", "Qnet", "UCT",
                "Nmcts"):
        assert col in rows[0], col
    ps = [r["P"] for r in rows]
    assert ps == sorted(ps, reverse=True)
    for key in ("Vnet", "Vmem", "Nmem", "player", "terminated"):
        assert key in info
    # probabilities are normalized over legal actions
    assert sum(r["Pmcts"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["Pnet"] for r in rows) == pytest.approx(1.0, abs=1e-4)


def test_qnet_sees_immediate_win():
    """Qnet is the one-step lookahead r + gamma*(+-V): a move that wins
    immediately must have Qnet == +1 regardless of the network."""
    game = registry()["tictactoe"]
    spec = SimpleNetSpec(width=16, depth_common=1)
    net = Network(game, spec).init(jax.random.key(0))
    ex = Explorer(game, spec, net, MctsParams(num_iters_per_turn=8))
    # o to move, o wins by playing C (completing the top row)
    assert ex.go("oo. xx. ...")
    rows, info = ex.state_statistics()
    win = next(r for r in rows if r["action"] == "C")
    assert win["Qnet"] == pytest.approx(1.0)
    assert info["player"] == 0


def test_go_flip_undo_restart_commands(ttt_explorer):
    ex = ttt_explorer
    ex.restart()
    assert ex.go("ox. .o. ..x")
    assert int(np.asarray(ex.state.board).sum() > 0)
    before = np.asarray(ex.state.board).copy()
    assert ex.flip()  # board permuted, same stone multiset
    after = np.asarray(ex.state.board)
    assert sorted(before.tolist()) == sorted(after.tolist())
    ex.undo()
    np.testing.assert_array_equal(np.asarray(ex.state.board), before)
    ex.undo()
    assert int(np.asarray(ex.state.board).sum()) == 0
    assert not ex.go("not a state")


def test_repl_scripted_session(ttt_explorer):
    """Drive the REPL with a scripted command stream (the explorer loop of
    ``explorer.jl:252-268``)."""
    ex = ttt_explorer
    ex.restart()
    cmds = iter(["do A", "E", "go ox. .o. ..x", "explore 8", "flip",
                 "undo", "restart", "quit"])
    out = []
    ex.repl(input_fn=lambda _: next(cmds), print_fn=out.append)
    text = "\n".join(map(str, out))
    assert "Qmcts" in text and "UCT" in text and "Qnet" in text
    assert "invalid" not in text.lower()
    # after restart the state is the initial one
    assert int(np.asarray(ex.state.board).sum()) == 0


def test_connect_four_go_moves_notation():
    game = registry()["connect-four"]
    spec = SimpleNetSpec(width=16, depth_common=1)
    net = Network(game, spec).init(jax.random.key(0))
    ex = Explorer(game, spec, net, MctsParams(num_iters_per_turn=8))
    assert ex.go("4453")
    assert int(np.asarray(ex.state.board != 0).sum()) == 4
    assert not ex.go("8")  # illegal column


def test_interactive_play_any_pairing():
    """``interactive_play`` supports ANY player pairing like the
    reference's ``GI.interactive!`` (``src/play.jl:357-379``): two humans
    (no network needed), human-vs-agent, and agent-vs-agent."""
    from alphazero_tpu.session.explorer import interactive_play

    game = registry()["tictactoe"]
    out = []

    # two humans play a scripted full game (single-letter cells A..I):
    # white takes A,B,C — the top row — and wins
    moves = iter(["A", "D", "B", "E", "C"])
    interactive_play(game, players=("human", "human"),
                     input_fn=lambda prompt: next(moves),
                     print_fn=out.append)
    text = "\n".join(str(x) for x in out)
    assert "White reward: 1.0" in text

    # agent-vs-agent: plays a full game unattended
    spec = SimpleNetSpec(width=16, depth_common=1)
    net = Network(game, spec).init(jax.random.key(0))
    out2 = []
    interactive_play(game, spec, net, MctsParams(num_iters_per_turn=8),
                     players=("agent", "agent"),
                     input_fn=lambda prompt: pytest.fail("no human input"),
                     print_fn=out2.append)
    assert any("White reward:" in str(x) for x in out2)

    # an agent seat without a net fails loudly
    with pytest.raises(ValueError, match="trained network"):
        interactive_play(game, players=("human", "agent"))
