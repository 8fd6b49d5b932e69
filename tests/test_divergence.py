"""Suite divergence detection + bounded auto-refit (VERDICT r4 next #1).

The 150-epoch 1080p corpus suite shipped one video collapsed to 6.96 dB
(init-draw collapse: the same content trains standalone to 35.85 dB —
BENCHMARKS "MRI variant-1 collapse").  The original detector only tested
``final < early`` and was blind to collapses BEFORE the 20%-of-schedule
snapshot; these tests pin the repaired detector (late collapse + absolute
outlier + sanity floor) and the fresh-init auto-refit wiring."""

import numpy as np

from repnerv_tpu.cli.suite_main import _refit_flagged, flag_divergent


# ---------------------------------------------------------------------------
# flag_divergent — pure detector
# ---------------------------------------------------------------------------


def test_healthy_suite_not_flagged():
    early = [20.1, 19.8, 21.0, 20.5]
    final = [30.2, 29.8, 31.1, 30.0]
    assert flag_divergent(early, final) == []


def test_late_collapse_flagged():
    """The original semantics: final fell below the 20% snapshot."""
    early = [20.0, 20.0, 20.0]
    final = [30.0, 6.9, 30.5]
    assert flag_divergent(early, final) == [1]


def test_early_collapse_flagged_despite_flat_trajectory():
    """The round-4 blind spot: a video that collapses BEFORE the 20% mark
    has final ~= early, so ``final < early`` passes silently.  The absolute
    outlier test (suite median - 12 dB) catches it — the actual collapse
    was 6.96 dB against a 21.2 dB suite median."""
    early = [28.0, 6.9, 27.0, 30.0, 25.0, 26.0, 29.0]
    final = [29.2, 7.0, 28.1, 35.9, 26.0, 27.5, 30.1]  # video 1 "rose" 0.1
    assert flag_divergent(early, final) == [1]


def test_sanity_floor_flagged_even_when_median_is_low():
    """If most of a small suite collapses, the median test is blinded —
    the absolute floor still fires."""
    early = [7.0, 7.2]
    final = [7.5, 7.4]
    assert flag_divergent(early, final) == [0, 1]


def test_hard_class_spread_not_flagged():
    """The corpus legitimately spreads ~24 dB at fixed capacity (text 12.3
    vs MRI 35.9, suite median ~21) — hard classes must NOT be flagged."""
    early = [30.0, 18.0, 10.5, 25.0, 30.1, 18.2, 10.6]
    final = [35.9, 21.2, 12.3, 29.2, 35.8, 21.1, 12.3]
    assert flag_divergent(early, final) == []


def test_saturated_flat_fit_tolerates_noise():
    """A saturated fit whose final is a hair under the 20% snapshot (bf16
    eval noise) is not a collapse."""
    early = [35.85, 20.0]
    final = [35.80, 30.0]
    assert flag_divergent(early, final) == []


def test_actual_round4_suite_trajectory():
    """The recorded 150-epoch corpus suite train outcome: exactly video 4
    (6.96 dB vs suite median 21.2) must flag, nothing else."""
    final = [35.86, 21.17, 12.28, 29.21, 6.96, 21.13, 12.27]
    early = [f - 1.0 for f in final]  # plausible flat-ish late trajectory
    assert flag_divergent(early, final) == [4]


# ---------------------------------------------------------------------------
# _refit_flagged — bounded retries, best-of selection
# ---------------------------------------------------------------------------


def test_refit_bounded_retries_keep_best(monkeypatch):
    """Attempt 1 lands worse than the collapse, attempt 2 recovers: the
    refit keeps the best params, reports both attempts, and stops once the
    video passes the detector."""
    import repnerv_tpu.cli.suite_main as sm

    import jax

    outcomes = iter([("p1", 3.0, 4.0), ("p2", 20.0, 30.0)])

    def fake_fit_one(cfg, store, key, v, epoch_fns, with_msssim, early_epoch):
        return next(outcomes)

    monkeypatch.setattr(sm, "_fit_one", fake_fit_one)
    per_video_params = ["orig0", "orig1"]
    train_early = [20.0, 20.0]
    train_final = [6.9, 30.0]
    vkeys = jax.random.split(jax.random.PRNGKey(0), 2)
    info = _refit_flagged(
        [0], per_video_params, train_early, train_final,
        stores=[None, None], cfg=None, vkeys=vkeys, epoch_fns={},
        with_msssim=False, early_epoch=2, max_refits=3,
    )
    assert info[0]["attempts"] == 2
    assert info[0]["initial_train_psnr"] == 6.9
    assert info[0]["refit_train_psnr"] == 30.0
    assert per_video_params[0] == "p2"
    assert train_final == [30.0, 30.0] and train_early[0] == 20.0


def test_refit_never_downgrades(monkeypatch):
    """If every retry is worse than the original, the original params stay
    and the row still reports the attempts."""
    import repnerv_tpu.cli.suite_main as sm

    import jax

    monkeypatch.setattr(
        sm, "_fit_one", lambda *a, **k: ("worse", 2.0, 3.0)
    )
    per_video_params = ["orig0", "orig1"]
    train_early = [20.0, 20.0]
    train_final = [6.9, 30.0]
    vkeys = jax.random.split(jax.random.PRNGKey(0), 2)
    info = _refit_flagged(
        [0], per_video_params, train_early, train_final,
        stores=[None, None], cfg=None, vkeys=vkeys, epoch_fns={},
        with_msssim=False, early_epoch=2, max_refits=2,
    )
    assert info[0]["attempts"] == 2
    assert info[0]["refit_train_psnr"] == 6.9
    assert per_video_params[0] == "orig0"


# ---------------------------------------------------------------------------
# run_suite wiring — a flagged video is refit and re-measured end-to-end
# ---------------------------------------------------------------------------


def test_run_suite_refits_flagged_video(monkeypatch, tmp_path):
    """End-to-end on a tiny CPU suite: force the detector to flag video 0
    once; run_suite must refit it, attach the refit record to its row, and
    leave the JSON free of the ``diverged`` marker once recovered."""
    import repnerv_tpu.cli.suite_main as sm
    from test_model_train import tiny_train

    calls = {"n": 0}
    real = sm.flag_divergent

    def flaky_first(early, final, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            return [0]
        return real(early, final, **kw)

    monkeypatch.setattr(sm, "flag_divergent", flaky_first)
    import dataclasses

    cfg = tiny_train(epochs=10)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, dataset="synth"))
    out = tmp_path / "suite.json"
    result = sm.run_suite(cfg, 2, "sequential", str(out), max_refits=1)
    rows = result["videos"]
    assert "refit" in rows[0] and rows[0]["refit"]["attempts"] == 1
    assert "diverged" not in rows[0]
    assert "refit" not in rows[1]
    assert np.isfinite(rows[0]["psnr"])


def test_run_suite_zero_epochs_no_detector(tmp_path):
    """cfg.epochs == 0 (measure-only) must not crash on the final-metrics
    snapshot (round-4 bug: loop variable referenced after an empty epoch
    loop) and must skip detection entirely."""
    from test_model_train import tiny_train

    from repnerv_tpu.cli.suite_main import run_suite

    import dataclasses

    cfg = tiny_train(epochs=0)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, dataset="synth"))
    out = tmp_path / "suite.json"
    result = run_suite(cfg, 2, "sequential", str(out))
    assert len(result["videos"]) == 2
    assert all("diverged" not in r for r in result["videos"])


# ---------------------------------------------------------------------------
# content_motion profiles (text-class floor analysis instrumentation)
# ---------------------------------------------------------------------------


def test_content_motion_profiles():
    """static -> every frame identical; slow -> smaller adjacent-frame
    residual than normal; all three share the same content source."""
    from repnerv_tpu.data.frames import corpus_video

    kw = dict(n_frames=6, h=48, w=64, seed=3)
    normal, _ = corpus_video(**kw, motion="normal")
    slow, _ = corpus_video(**kw, motion="slow")
    static, _ = corpus_video(**kw, motion="static")
    assert all(np.array_equal(static[0], f) for f in static[1:])
    d = lambda v: np.abs(np.diff(v.astype(np.float32), axis=0)).mean()
    assert d(slow) < d(normal)
    assert d(normal) > 0.0


def test_content_motion_cli_flag():
    """--content_motion reaches DataConfig through the arg parser."""
    from repnerv_tpu.cli.args import args_to_config, build_parser

    p = build_parser(eval_mode=False)
    a = p.parse_args(["--content_motion", "static"])
    assert args_to_config(a).data.content_motion == "static"
