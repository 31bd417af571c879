"""Block-mode best-checkpoint semantics (VERDICT r1 weak #6).

In --ticks_per_block mode, per-tick params never reach the host; the device
must snapshot the improving tick's train state inside the scanned block so
the saved `best_*` file holds the params THAT achieved the logged metric —
the reference saves at the improving epoch directly
(/root/reference/learn/training_loop.py:121-133).

The invariant tested: for every species and tracked metric, the epoch in the
best_* filename equals the argmin epoch of that metric in the logged
per-epoch series, and when that epoch is not the block end, the saved params
differ from the end-of-block `latest` params.
"""

import glob
import json
import os

import numpy as np

from madrona_bots_tpu.learn import training_loop


def test_block_best_matches_logged_argmin(tmp_path):
    save_dir = str(tmp_path / "ckpts")
    argv = [
        "--num_worlds", "8", "--num_epochs", "8", "--ticks_per_block", "4",
        "--create_universe", "--universe_id", "bb", "--model_save_dir",
        save_dir, "--hidden_dim", "32", "--seed", "3", "--ckpt_every", "100",
    ]
    training_loop.main(argv)

    jsonl = os.path.join(save_dir, "universe_bb-r8.metrics.jsonl")
    rows = [json.loads(l) for l in open(jsonl)]
    # Per-epoch series in order; rows may contain init rows without losses.
    series = [r for r in rows if "species_1_total_loss" in r]
    assert len(series) == 8

    mid_block_hits = 0
    for sp in range(1, 5):
        for metric in ("actor_loss", "critic_loss", "total_loss"):
            vals = [r[f"species_{sp}_{metric}"] for r in series]
            argmin_epoch = int(np.argmin(vals)) + 1  # epochs are 1-based
            files = glob.glob(os.path.join(
                save_dir, "universe_bb", f"species_{sp}",
                f"best_{metric}_epoch_*.ckpt.npz"))
            assert len(files) == 1, (sp, metric, files)
            file_epoch = int(files[0].split("_")[-1].split(".")[0])
            assert file_epoch == argmin_epoch, (
                f"species {sp} {metric}: best file epoch {file_epoch} != "
                f"logged argmin epoch {argmin_epoch}")

            if file_epoch not in (4, 8):  # improving tick mid-block
                mid_block_hits += 1
                latest = glob.glob(os.path.join(
                    save_dir, "universe_bb", f"species_{sp}",
                    "latest_model_epoch_*.ckpt.npz"))[0]
                a = np.load(files[0])
                b = np.load(latest)
                diff = any(not np.array_equal(a[k], b[k])
                           for k in a.files if k.startswith("p_"))
                assert diff, (f"species {sp} {metric}: snapshot params equal "
                              "block-end params despite mid-block argmin")
    # The test only bites if some argmin landed mid-block; seed 3 should
    # produce at least one — fail loudly if the scenario degenerates.
    assert mid_block_hits >= 1, "no mid-block best epochs; pick another seed"
