"""Integration: the train.py and eval.py CLIs on a fake kubric scene.

Exercises config loading (gin bindings), checkpoint save/restore,
two-stage finetune, chunked rendering, metrics, and image output layout
(including the HuGS `--original_name --only_pred_gt` contract).
"""

import glob
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tests.test_data import make_fake_kubric_scene


def tiny_bindings(scene_dir, ckpt_dir, extra=()):
    return [
        "Config.dataset_loader = 'kubric'",
        f"Config.data_dir = '{scene_dir}'",
        f"Config.checkpoint_dir = '{ckpt_dir}'",
        "Config.factor = 1",
        "Config.batch_size = 128",
        "Config.image_num_per_batch = 2",
        "Config.max_steps = 8",
        "Config.checkpoint_every = 8",
        "Config.print_every = 4",
        "Config.train_render_every = 8",
        "Config.render_chunk_size = 128",
        "Config.near = 0.1",
        "Config.far = 4.0",
        "Config.grad_max_norm = 0.0",
        "Config.data_loss_type = 'mse'",
        "Config.vis_num_rays = 2",
        "Model.num_prop_samples = 8",
        "Model.num_nerf_samples = 4",
        "Model.num_levels = 2",
        "NerfMLP.net_depth = 2",
        "NerfMLP.net_width = 16",
        "NerfMLP.bottleneck_width = 8",
        "NerfMLP.net_width_viewdirs = 8",
        "NerfMLP.max_deg_point = 4",
        "PropMLP.net_depth = 2",
        "PropMLP.net_width = 8",
        "PropMLP.disable_rgb = True",
        "PropMLP.max_deg_point = 4",
    ] + list(extra)


def test_train_then_eval_cli(tmp_path):
    import train as train_driver
    import eval as eval_driver

    scene = tmp_path / "scene"
    ckpt = tmp_path / "ckpt"
    make_fake_kubric_scene(str(scene))

    argv = []
    for b in tiny_bindings(str(scene), str(ckpt)):
        argv += [f"--gin_bindings={b}"]
    train_driver.main(argv)

    assert (ckpt / "checkpoint_8").exists()
    assert (ckpt / "config.gin").exists()

    eval_driver.main(argv + ["--eval_data=test"])
    preds = sorted(glob.glob(str(ckpt / "test_preds" / "*_color.png")))
    gts = sorted(glob.glob(str(ckpt / "test_preds" / "*_gt.png")))
    assert len(preds) == 2 and len(gts) == 2
    metrics_files = glob.glob(str(ckpt / "metrics_test_*.txt"))
    assert metrics_files
    text = open(metrics_files[0]).read()
    assert "psnr" in text and "ssim" in text


def test_train_finetune_and_hugs_eval_contract(tmp_path):
    import train as train_driver
    import eval as eval_driver

    scene = tmp_path / "scene"
    ckpt = tmp_path / "ckpt"
    make_fake_kubric_scene(str(scene))

    extra = [
        "Config.finetune_enable = True",
        "Config.finetune_max_steps = 4",
        "Config.finetune_batch_size = 128",
        "Config.finetune_image_num_per_batch = 2",
        "Model.num_glo_features = 4",
        "Config.train_render_every = 0",
    ]
    argv = [f"--gin_bindings={b}"
            for b in tiny_bindings(str(scene), str(ckpt), extra)]
    train_driver.main(argv)
    assert (ckpt / "finetune" / "checkpoint_4").exists()

    # HuGS mask-generation input contract: train_preds/{name}_{color,gt}.png.
    eval_driver.main(argv + ["--eval_data=train", "--original_name",
                             "--only_pred_gt"])
    colors = sorted(glob.glob(str(ckpt / "train_preds" / "*_color.png")))
    names = {os.path.basename(p) for p in colors}
    assert names == {"00000_color.png", "00001_color.png", "00002_color.png"}


def test_render_cli(tmp_path):
    import train as train_driver
    import render as render_driver

    scene = tmp_path / "scene"
    ckpt = tmp_path / "ckpt"
    make_fake_kubric_scene(str(scene))
    argv = [f"--gin_bindings={b}"
            for b in tiny_bindings(str(scene), str(ckpt),
                                   ["Config.train_render_every = 0"])]
    train_driver.main(argv)
    render_driver.main(argv)
    renders = sorted(glob.glob(str(ckpt / "render" / "test_preds_step_8"
                                   / "color_*.png")))
    assert len(renders) == 2
    depths = glob.glob(str(ckpt / "render" / "test_preds_step_8"
                           / "distance_mean_*.tiff"))
    assert len(depths) == 2
    # Job sharding: job 1 of 2 renders only the odd frames.
    ckpt2 = tmp_path / "ckpt2"
    argv2 = [f"--gin_bindings={b}"
             for b in tiny_bindings(str(scene), str(ckpt2),
                                    ["Config.train_render_every = 0",
                                     "Config.render_num_jobs = 2",
                                     "Config.render_job_id = 1"])]
    train_driver.main(argv2)
    render_driver.main(argv2)
    renders2 = sorted(glob.glob(str(ckpt2 / "render" / "test_preds_step_8"
                                    / "color_*.png")))
    assert [os.path.basename(r) for r in renders2] == ["color_001.png"]


def test_train_resume_from_checkpoint(tmp_path):
    """Preemption recovery: a second train.py invocation resumes from the
    saved step instead of restarting (reference train.py:121-123)."""
    import train as train_driver

    scene = tmp_path / "scene"
    ckpt = tmp_path / "ckpt"
    make_fake_kubric_scene(str(scene))
    extra = ["Config.checkpoint_every = 4", "Config.train_render_every = 0"]
    argv = [f"--gin_bindings={b}"
            for b in tiny_bindings(str(scene), str(ckpt), extra)]
    train_driver.main(argv)  # runs to step 8, checkpoints at 4 and 8
    assert (ckpt / "checkpoint_8").exists()
    import shutil
    shutil.rmtree(ckpt / "checkpoint_8")  # simulate preemption after step 4
    train_driver.main(argv)  # must resume from 4, re-reach 8
    assert (ckpt / "checkpoint_8").exists()


def test_eval_polling_waits_then_exits_at_final_step(tmp_path, monkeypatch):
    """Polling-mode eval (eval_only_once=False) launched before training:
    it must WAIT for the first checkpoint (reference eval.py:65-80 restores
    the init state and sleeps, never crashes) and TERMINATE once the final
    expected checkpoint is evaluated (reference eval.py:244-249)."""
    import time as time_mod

    import train as train_driver
    import eval as eval_driver

    scene = tmp_path / "scene"
    ckpt = tmp_path / "ckpt"
    make_fake_kubric_scene(str(scene))
    extra = ["Config.eval_only_once = False",
             "Config.train_render_every = 0"]
    argv = [f"--gin_bindings={b}"
            for b in tiny_bindings(str(scene), str(ckpt), extra)]

    # The sleep hook stands in for the concurrently-running trainer: the
    # first wait-for-checkpoint sleep creates the checkpoints, so eval's
    # next polling iteration finds step 8 == max_steps and terminates.
    slept = []

    def fake_sleep(sec):
        if not slept:
            train_driver.main(argv)
        slept.append(sec)

    monkeypatch.setattr(time_mod, "sleep", fake_sleep)
    eval_driver.main(argv + ["--eval_data=test"])  # returns == terminated

    assert slept, "eval never hit the wait-for-checkpoint branch"
    preds = glob.glob(str(ckpt / "test_preds" / "*_color.png"))
    assert len(preds) == 2
    log = (ckpt / "run_log.log").read_text()
    assert "no checkpoint yet" in log


def test_render_videos_made_by_last_finishing_job(tmp_path, monkeypatch):
    """Sharded rendering: whichever job completes the frame set encodes the
    videos (reference render.py:198-203), not only the num_jobs==1 case."""
    import train as train_driver
    import render as render_driver

    scene = tmp_path / "scene"
    ckpt = tmp_path / "ckpt"
    make_fake_kubric_scene(str(scene))
    argv = [f"--gin_bindings={b}"
            for b in tiny_bindings(str(scene), str(ckpt),
                                   ["Config.train_render_every = 0"])]
    train_driver.main(argv)

    calls = []
    monkeypatch.setattr(render_driver, "create_videos",
                        lambda *a, **k: calls.append(a))
    for job in (0, 1):
        extra = ["Config.train_render_every = 0",
                 "Config.render_num_jobs = 2",
                 f"Config.render_job_id = {job}"]
        render_driver.main([f"--gin_bindings={b}"
                            for b in tiny_bindings(str(scene), str(ckpt),
                                                   extra)])
    assert len(calls) == 1  # job 0 saw a partial set; job 1 completed it


def test_train_frac_semantics(tmp_path, monkeypatch):
    """train_frac parity: the finetune stage runs at 1.0 (reference
    train.py:141) and eval renders a mid-training checkpoint at
    step / max_steps (reference eval.py:103), not at 1.0."""
    import shutil

    import train as train_driver
    import eval as eval_driver
    from nerf_hugs_tpu.train import step as train_step_lib
    from nerf_hugs_tpu.train import render_image as ri_mod

    scene = tmp_path / "scene"
    ckpt = tmp_path / "ckpt"
    make_fake_kubric_scene(str(scene))
    extra = [
        "Config.finetune_enable = True",
        "Config.finetune_max_steps = 4",
        "Config.finetune_batch_size = 128",
        "Config.finetune_image_num_per_batch = 2",
        "Model.num_glo_features = 4",
        "Config.train_render_every = 0",
        "Config.checkpoint_every = 4",
    ]
    argv = [f"--gin_bindings={b}"
            for b in tiny_bindings(str(scene), str(ckpt), extra)]

    finetune_fracs = []
    real_setup_ft = train_step_lib.setup_finetune_model

    def spy_setup_ft(config, model, state, mesh):
        state, train_step, lr_fn = real_setup_ft(config, model, state, mesh)

        def spy_step(rngs, state, batch, train_frac, thresholds):
            finetune_fracs.append(float(train_frac))
            return train_step(rngs, state, batch, train_frac, thresholds)

        return state, spy_step, lr_fn

    monkeypatch.setattr(train_step_lib, "setup_finetune_model", spy_setup_ft)
    train_driver.main(argv)
    assert finetune_fracs and all(f == 1.0 for f in finetune_fracs)

    # Make step 4 (of max_steps 8) the latest TRAIN checkpoint; drop the
    # finetune dir so eval scores the mid-training train stage.
    shutil.rmtree(ckpt / "finetune")
    shutil.rmtree(ckpt / "checkpoint_8")
    eval_fracs = []
    real_render_image = ri_mod.render_image

    def spy_render(render_fn, rays, train_frac, *a, **k):
        eval_fracs.append(float(train_frac))
        return real_render_image(render_fn, rays, train_frac, *a, **k)

    monkeypatch.setattr(ri_mod, "render_image", spy_render)
    eval_driver.main(argv + ["--eval_data=test"])
    assert eval_fracs and all(f == 0.5 for f in eval_fracs)  # step 4 / 8


def test_embedding_capacity_guard(tmp_path):
    """More train images than embedding rows fails loudly (reference
    train.py:113-117) — on TPU the lookup would otherwise silently clamp."""
    import pytest as _pytest

    import train as train_driver

    scene = tmp_path / "scene"
    make_fake_kubric_scene(str(scene))
    extra = ["Model.num_glo_features = 4", "Model.num_embeddings = 2"]
    argv = [f"--gin_bindings={b}"
            for b in tiny_bindings(str(scene), str(tmp_path / "ckpt"), extra)]
    with _pytest.raises(ValueError, match="Number of embeddings"):
        train_driver.main(argv)


def test_train_resume_mid_finetune(tmp_path):
    """Preemption during the FINETUNE stage: a rerun must resume finetune
    from its last checkpoint (not restart it, not redo the train stage)."""
    import shutil

    import train as train_driver

    scene = tmp_path / "scene"
    ckpt = tmp_path / "ckpt"
    make_fake_kubric_scene(str(scene))
    extra = [
        "Config.finetune_enable = True",
        "Config.finetune_max_steps = 8",
        "Config.finetune_batch_size = 128",
        "Config.finetune_image_num_per_batch = 2",
        "Model.num_glo_features = 4",
        "Config.train_render_every = 0",
        "Config.checkpoint_every = 4",
    ]
    argv = [f"--gin_bindings={b}"
            for b in tiny_bindings(str(scene), str(ckpt), extra)]
    train_driver.main(argv)
    assert (ckpt / "finetune" / "checkpoint_8").exists()

    # Preempted after finetune step 4: drop the final finetune checkpoint.
    shutil.rmtree(ckpt / "finetune" / "checkpoint_8")
    train_driver.main(argv)  # resumes finetune from 4, re-reaches 8
    assert (ckpt / "finetune" / "checkpoint_8").exists()


def test_eval_polling_evaluates_finetune_after_same_numbered_train_step(
        tmp_path, monkeypatch):
    """Train and finetune checkpoints share bare step numbers; polling eval
    must still evaluate finetune/checkpoint_N after train checkpoint_N
    (dedupe tracks the EFFECTIVE step) and then terminate."""
    import shutil
    import time as time_mod

    import train as train_driver
    import eval as eval_driver

    scene = tmp_path / "scene"
    ckpt = tmp_path / "ckpt"
    make_fake_kubric_scene(str(scene))
    extra = [
        "Config.finetune_enable = True",
        "Config.finetune_max_steps = 8",   # == max_steps: step collision
        "Config.finetune_batch_size = 128",
        "Config.finetune_image_num_per_batch = 2",
        "Model.num_glo_features = 4",
        "Config.train_render_every = 0",
        "Config.eval_only_once = False",
    ]
    argv = [f"--gin_bindings={b}"
            for b in tiny_bindings(str(scene), str(ckpt), extra)]
    train_driver.main(argv)
    assert (ckpt / "finetune" / "checkpoint_8").exists()

    # Hide the finetune dir; the sleep hook restores it, standing in for a
    # finetune stage that finishes while eval is polling.
    hidden = tmp_path / "ft_hidden"
    shutil.move(str(ckpt / "finetune"), str(hidden))
    restored = []

    def fake_sleep(sec):
        if not restored:
            shutil.move(str(hidden), str(ckpt / "finetune"))
            restored.append(True)

    monkeypatch.setattr(time_mod, "sleep", fake_sleep)
    eval_driver.main(argv + ["--eval_data=test"])  # returns == terminated
    assert restored, "eval terminated without ever polling again"
    log = (ckpt / "run_log.log").read_text()
    # Both the train checkpoint and the same-numbered finetune checkpoint
    # were evaluated.
    assert "Evaluating checkpoint step 8 from" in log
    assert "finetune" in log.split("Evaluating checkpoint step 8 from")[-1] \
        or log.count("Evaluating checkpoint step 8 from") == 2


def test_embedding_capacity_guard_covers_finetune_offsets(tmp_path):
    """The finetune stage trains on the TEST split whose embed indices are
    offset by the train count — a table sized to the train set must fail."""
    import pytest as _pytest

    import train as train_driver

    scene = tmp_path / "scene"
    make_fake_kubric_scene(str(scene))  # 3 train + 2 test -> needs 5 rows
    extra = [
        "Config.finetune_enable = True",
        "Config.finetune_max_steps = 4",
        "Config.finetune_batch_size = 128",
        "Config.finetune_image_num_per_batch = 2",
        "Model.num_glo_features = 4",
        "Model.num_embeddings = 3",        # covers train, not test offsets
        "Config.train_render_every = 0",
    ]
    argv = [f"--gin_bindings={b}"
            for b in tiny_bindings(str(scene), str(tmp_path / "ckpt"), extra)]
    with _pytest.raises(ValueError, match="max embedding index"):
        train_driver.main(argv)
