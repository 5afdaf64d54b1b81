"""GoEnv surface parity tests: registration, spaces, info dict, action
normalization, class attrs — the §2.3 table of SURVEY.md."""

import warnings

import numpy as np
import pytest

import gymgo_tpu
from gymgo_tpu import gogame, govars
from gymgo_tpu.env import GoEnv, GoExtraHardEnv


def test_gymnasium_registration_and_make():
    gymnasium = pytest.importorskip("gymnasium")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        env = gymnasium.make("go-v0", size=7, komi=1.5)
        obs = env.reset(seed=0)
        state, reward, done, info = env.step((0, 0))
    assert state.shape == (6, 7, 7)
    assert env.unwrapped.komi == 1.5
    assert "go-extrahard-v0" in gymnasium.registry


def test_spaces():
    env = GoEnv(size=9)
    assert env.observation_space.shape == (govars.NUM_CHNLS, 9, 9)
    assert env.action_space.n == 82


def test_class_attrs_are_modules():
    assert GoEnv.gogame is gogame
    assert GoEnv.govars is govars
    env = GoEnv(size=5)
    env.reset()
    # tests in the reference call through the class attr (test_basics.py:51)
    s = env.gogame.next_state(env.state(), 0)
    assert s[govars.BLACK, 0, 0] == 1


def test_info_dict_contents():
    env = GoEnv(size=5)
    env.reset()
    _, _, _, info = env.step(3)
    assert set(info) == {"turn", "invalid_moves", "prev_player_passed"}
    assert info["turn"] == 1
    assert info["invalid_moves"].shape == (26,)
    assert not info["prev_player_passed"]


def test_action_normalization_and_bounds():
    env = GoEnv(size=5)
    env.reset()
    with pytest.raises(Exception):
        env.step((-1, 0))
    with pytest.raises(Exception):
        env.step((0, 100))
    env.step(np.array([2, 2]))  # ndarray accepted
    assert env.state()[govars.BLACK, 2, 2] == 1


def test_extrahard_stub():
    assert GoExtraHardEnv.metadata["render.modes"] == ["human", "terminal"]


def test_str_and_render_terminal(capsys):
    env = GoEnv(size=5)
    env.reset()
    env.step(0)
    env.render("terminal")
    out = capsys.readouterr().out
    assert "○" in out and "Turn: WHITE" in out


def test_uniform_random_action_matches_reference_rng():
    """Same np.random stream + same mask => same choice as the reference's
    np.random.choice(argwhere(valid)) (go_env.py:78-81)."""
    env = GoEnv(size=5)
    env.reset()
    env.step(3)
    valid = env.valid_moves()
    idcs = np.argwhere(valid).flatten()
    np.random.seed(7)
    expect = np.random.choice(idcs)
    np.random.seed(7)
    assert env.uniform_random_action() == expect


def test_gym_go_compat_shim_subprocess():
    """`import gym_go` (the bundled compatibility shim) must expose the
    reference package surface, isolated in a subprocess so it cannot collide
    with the test oracle's real-reference gym_go modules."""
    import subprocess
    import sys as _sys

    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import gym_go\n"
        "import numpy as np\n"
        "s = gym_go.gogame.init_state(5)\n"
        "s = gym_go.gogame.next_state(s, 0)\n"
        "assert s[gym_go.govars.BLACK, 0, 0] == 1\n"
        "env = gym_go.envs.GoEnv(size=5)\n"
        "env.reset(); env.step((1, 1))\n"
        "import gymnasium\n"
        "e2 = gymnasium.make('go-v0', size=5)\n"
        "print('compat-ok')\n"
    )
    out = subprocess.run(
        [_sys.executable, "-c", code],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert "compat-ok" in out.stdout, out.stderr[-2000:]


def test_backend_auto_picks_native_and_matches_jax():
    """backend='auto' (the default) uses the C++ host engine when it builds
    on this host, and plays bit-identically to the jax facade on a scripted
    game (the broad equivalence contract lives in tests/test_native_engine.py;
    this pins the *default-constructor* behavior)."""
    from gymgo_tpu.env.go_env import GoEnv

    auto = GoEnv(size=5)
    try:
        from gymgo_tpu.native import NativeGoEngine  # noqa: F401

        NativeGoEngine(5)
        native_ok = True
    except Exception:
        native_ok = False
    assert auto.backend == ("native" if native_ok else "jax")

    ref = GoEnv(size=5, backend="jax")
    moves = [(0, 0), (1, 1), (0, 1), (2, 0), None, (0, 2),
             (2, 2), None, (3, 3)]
    for mv in moves:
        oa, ra, da, _ = auto.step(mv)
        oj, rj, dj, _ = ref.step(mv)
        np.testing.assert_array_equal(oa, oj)
        assert (ra, da) == (rj, dj)


def test_jax_backend_reward_uses_fused_areas_and_matches_native():
    """The jax-backend single-env step keeps the kernel's own fused
    Trump-Taylor areas for reward() (no second device round trip); the
    cached values must be identity-fresh and bit-equal to the native
    engine's recomputation at every step (VERDICT r2 weak #6)."""
    np.random.seed(3)
    ej = GoEnv(size=7, backend="jax", reward_method="heuristic")
    try:
        en = GoEnv(size=7, backend="native", reward_method="heuristic")
    except Exception:
        pytest.skip("native engine unavailable")
    ej.reset()
    en.reset()
    for t in range(40):
        if ej.game_ended():
            break
        a = int(ej.uniform_random_action())
        sj, rj, dj, _ = ej.step(a)
        sn, rn, dn, _ = en.step(a)
        assert np.array_equal(sj, sn)
        assert rj == rn and dj == dn
        assert ej._fused_areas[0] is ej.state_  # cache actually hit
    # reset invalidates: _areas() must recompute, not serve stale values
    ej.reset()
    assert ej._areas() == (0, 0)
