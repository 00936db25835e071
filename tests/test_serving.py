"""DockingService: receptor-spectrum cache semantics + query parity."""
import numpy as np

from deeplocalproteindocking_tpu.config import DockConfig
from deeplocalproteindocking_tpu.data import synthetic_complex
from deeplocalproteindocking_tpu.pipeline import DockingPipeline
from deeplocalproteindocking_tpu.serving import DockingService


def _cfg(**kw):
    base = dict(grid_size=32, resolution=1.25, num_rotations=8,
                rotation_chunk=4, top_k=8, rep_features=(8,))
    base.update(kw)
    return DockConfig(**base)


class TestDockingService:
    def test_parity_with_pipeline(self):
        cplx = synthetic_complex(seed=8, n_res_rec=8, n_res_lig=4)
        cfg = _cfg()
        svc = DockingService(cfg)
        pipe = DockingPipeline(config=cfg)
        a = svc.dock(cplx.receptor, cplx.ligand, cluster=False)
        b = pipe.dock_complex(cplx, cluster=False)
        np.testing.assert_allclose(a.scores, b.scores, rtol=1e-5)
        np.testing.assert_array_equal(a.rot_idx, b.rot_idx)

    def test_receptor_cache_hits(self):
        c1 = synthetic_complex(seed=8, n_res_rec=8, n_res_lig=4)
        c2 = synthetic_complex(seed=9, n_res_rec=8, n_res_lig=4)
        svc = DockingService(_cfg())
        svc.dock(c1.receptor, c1.ligand, cluster=False)
        svc.dock(c1.receptor, c2.ligand, cluster=False)  # same receptor
        assert svc.stats == dict(entries=1, hits=1, misses=1)
        svc.dock(c2.receptor, c2.ligand, cluster=False)  # new receptor
        assert svc.stats["misses"] == 2

    def test_key_sensitivity(self):
        """Key changes with structure, geometry, and params."""
        c = synthetic_complex(seed=8, n_res_rec=8, n_res_lig=4)
        svc = DockingService(_cfg())
        k0 = svc.receptor_key(c.receptor)
        # structure perturbation
        import dataclasses
        moved = dataclasses.replace(
            c.receptor, coords=c.receptor.coords + 0.5)
        assert svc.receptor_key(moved) != k0
        # geometry change
        svc2 = DockingService(_cfg(resolution=1.5))
        assert svc2.receptor_key(c.receptor) != k0
        # params change (learned vs shape)
        svc3 = DockingService(_cfg(rep_features=(8, 8)))
        svc3.pipeline.init_params(seed=0)
        svc3.params = svc3.pipeline.params
        assert svc3.receptor_key(c.receptor) != k0

    def test_lru_eviction(self):
        svc = DockingService(_cfg(), capacity=2)
        cs = [synthetic_complex(seed=10 + s, n_res_rec=6, n_res_lig=3)
              for s in range(3)]
        for c in cs:
            svc.prepare_receptor(c.receptor)
        assert svc.stats["entries"] == 2
        # oldest evicted: re-preparing it is a miss
        svc.prepare_receptor(cs[0].receptor)
        assert svc.stats["misses"] == 4

    def test_rescore_through_cache(self):
        cplx = synthetic_complex(seed=8, n_res_rec=8, n_res_lig=4)
        svc = DockingService(_cfg(top_k=8))
        poses = svc.dock(cplx.receptor, cplx.ligand)
        res = svc.rescore(cplx.receptor, cplx.ligand, poses, top=2,
                          nrot=8)
        assert len(res) == len(poses)
        assert res.scores[0] >= poses.scores[0] - 1e-4
