"""Arena + Elo league (pomcpp_tpu/arena.py)."""

import numpy as np

from pomcpp_tpu.arena import GameResults, League, elo_expected, play_games


def test_play_games_reports_outcomes():
    res = play_games(["simple", "random", "lazy", "random"], games=4,
                     steps=120, seed=3)
    assert res.done.shape == (4,)
    # Finished non-draw games have a valid winner id.
    for g in range(4):
        if res.done[g] and not res.draws[g]:
            assert 0 <= res.winners[g] < 4


def test_play_games_multi_net_dict_roster():
    """Dict params mode (generation line-ups): each ppo:<name> slot loads
    its own params, and two different nets actually act differently."""
    import jax

    from pomcpp_tpu.learner import ppo_init

    pa = ppo_init(jax.random.PRNGKey(1)).params
    pb = ppo_init(jax.random.PRNGKey(2)).params
    res = play_games(
        ["ppo:a", "ppo:b", "random", "random"], games=3, steps=30,
        seed=5, ppo_params={"ppo:a": pa, "ppo:b": pb},
    )
    assert res.winners.shape == (3,)
    # Single-pytree mode still works for plain "ppo" slots (a flax params
    # dict must NOT be mistaken for a roster dict).
    res2 = play_games(
        ["ppo", "random", "random", "random"], games=2, steps=20,
        seed=5, ppo_params=pa,
    )
    assert res2.winners.shape == (2,)


def test_play_games_view_range_full_board():
    """A view_range-10 net (21x21 crop) plays through the arena."""
    import jax

    from pomcpp_tpu.learner import PPOConfig, ppo_init

    p10 = ppo_init(jax.random.PRNGKey(3), PPOConfig(view_range=10)).params
    res = play_games(
        ["ppo", "random", "random", "random"], games=2, steps=20,
        seed=7, ppo_params=p10, view_range=10,
    )
    assert res.winners.shape == (2,)


def test_league_elo_updates():
    lg = League(["a", "b", "c", "d"], k=32.0)
    # Agent slot 0 ("a") wins both games; b/c/d share draws among them.
    res = GameResults(
        done=np.array([True, True]),
        winners=np.array([0, 0], np.int32),
        draws=np.array([False, False]),
        steps=10,
    )
    lg.record(["a", "b", "c", "d"], res)
    table = lg.table()
    assert table[0][0] == "a" and table[0][1] > 1200.0
    assert all(r < 1200.0 for _, r, _ in table[1:])
    # Symmetric expectations.
    assert abs(elo_expected(1200, 1200) - 0.5) < 1e-9
    # Zero-sum within each pair update.
    assert abs(sum(lg.ratings.values()) - 4 * 1200.0) < 1e-6


def test_play_games_with_mcts_lineup():
    res = play_games(
        ["mcts", "random", "random", "random"], games=3, steps=40,
        seed=3, search_kwargs={"n_sim": 6, "depth": 3, "max_tree_depth": 3},
    )
    assert res.winners.shape == (3,)
    assert res.steps <= 40


def test_league_pairs_score_from_pre_game_ratings():
    # Winner in slot 1: every pair must be judged from the PRE-game
    # ratings, so the three equal-rated losers come out identical
    # regardless of pair iteration order (pair-by-pair updates would
    # penalize later pairs against the winner's already-raised rating).
    lg2 = League(["a", "b", "c", "d"], k=32.0)
    res2 = GameResults(
        done=np.array([True]),
        winners=np.array([1], np.int32),
        draws=np.array([False]),
        steps=10,
    )
    lg2.record(["a", "b", "c", "d"], res2)
    # a, c, d all drew each other and lost to b from identical pre-game
    # ratings -> identical post-game ratings.
    assert lg2.ratings["a"] == lg2.ratings["c"] == lg2.ratings["d"]
    assert lg2.ratings["b"] > 1200.0
