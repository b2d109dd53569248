"""Vectorized pure-JAX game environments (reference layer L1 + games/)."""

from .core import (Game, State, WHITE, BLACK, apply_temperature, sample_from,
                   uniform_policy)


def registry():
    """Name -> Game mapping (reference: ``src/examples.jl:17-30``)."""
    from . import tictactoe, connect_four
    games = {
        tictactoe.GAME.name: tictactoe.GAME,
        connect_four.GAME.name: connect_four.GAME,
    }
    try:
        from . import mancala
        games[mancala.GAME.name] = mancala.GAME
    except ImportError:
        pass
    try:
        from . import grid_world
        games[grid_world.GAME.name] = grid_world.GAME
    except ImportError:
        pass
    return games
