"""CLI subcommands end-to-end over temp files."""

import json
import os

import numpy as np
import pytest

from otslam_tpu.cli import main
from otslam_tpu.core import io as tio


class TestCLI:
    def test_merge_2d(self, tmp_path, capsys):
        old = np.full((20, 20), 254, np.uint8)
        new = np.zeros((20, 20), np.uint8)
        tio.write_pgm(str(tmp_path / "old.pgm"), old)
        tio.write_pgm(str(tmp_path / "new.pgm"), new)
        out = str(tmp_path / "merged.pgm")
        main(["merge-2d", "--old", str(tmp_path / "old.pgm"),
              "--new", str(tmp_path / "new.pgm"),
              "--regions", "0,0,5,5;10,10,4,4", "--out", out])
        img = tio.read_pgm(out)
        assert (img[:5, :5] == 0).all() and img[7, 7] == 254

    def test_hybrid_map(self, tmp_path, rng, capsys):
        img = np.full((16, 16), 254, np.uint8)
        img[4:6, 4:6] = 0
        tio.write_pgm(str(tmp_path / "map.pgm"), img)
        tio.write_map_yaml(str(tmp_path / "map.yaml"), "map.pgm", 0.05,
                           (0.0, 0.0, 0.0))
        objdir = tmp_path / "objs"
        tio.write_ply(str(objdir / "Object_0.ply"),
                      rng.standard_normal((30, 3)).astype(np.float32))
        out = str(tmp_path / "hybrid.ply")
        main(["hybrid-map", "--map-yaml", str(tmp_path / "map.yaml"),
              "--map-pgm", str(tmp_path / "map.pgm"),
              "--objects", str(objdir), "--out", out])
        data = tio.read_ply(out)
        assert len(data["points"]) == 4 + 30

    def test_eval_with_gt_ply(self, tmp_path, rng, capsys):
        pts = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
        tio.write_ply(str(tmp_path / "map.ply"), pts)
        tio.write_ply(str(tmp_path / "gt.ply"), pts)
        main(["eval", "--map", str(tmp_path / "map.ply"),
              "--gt", str(tmp_path / "gt.ply")])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["accuracy_cm"] < 0.01

    def test_check_frame_and_probe(self, tmp_path, capsys):
        depth = np.full((480, 640), 1.5, np.float32)
        tio.write_depth_png(str(tmp_path / "d.png"), depth)
        out = str(tmp_path / "frame.ply")
        main(["check-frame", "--depth", str(tmp_path / "d.png"),
              "--out", out, "--voxel", "0.05"])
        data = tio.read_ply(out)
        assert len(data["points"]) > 100
        np.testing.assert_allclose(data["points"][:, 2], 1.5, atol=1e-3)

        capsys.readouterr()  # clear check-frame output
        main(["probe-depth", str(tmp_path / "d.png")])
        stats = json.loads(capsys.readouterr().out)
        assert stats["dtype"] == "uint16"

    def test_trajectory(self, tmp_path, capsys):
        posedir = tmp_path / "poses"
        os.makedirs(posedir)
        for i in range(3):
            tio.write_pose_txt(str(posedir / f"Object_0_{i+1}.txt"), np.eye(4))
        out = str(tmp_path / "traj.ply")
        main(["trajectory", "--poses", str(posedir), "--out", out])
        assert len(tio.read_ply(out)["points"]) == 12
