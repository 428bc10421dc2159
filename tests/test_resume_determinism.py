"""Deterministic continuation across preemption + resume: the data
stream fast-forwards without loading (cycle skip) and per-step RNG keys
are fold_in(base, step), so a resumed run consumes exactly what an
uninterrupted run would have."""

import numpy as np

from onedc_tpu.data.datasets import DataLoader, cycle


class _Toy:
    """36 items; 'image' encodes the index so batches are comparable."""

    def __len__(self):
        return 36

    def __getitem__(self, i):
        return {"image": np.full((2, 2, 3), float(i), np.float32),
                "caption": f"c{i}", "name": f"n{i}"}


def _ids(batch):
    return batch["image"][:, 0, 0, 0].astype(int).tolist()


def test_cycle_skip_matches_uninterrupted_stream():
    n_batches = 23  # spans > 2 epochs at bs=4 over 36 items (9/epoch)
    ref = [_ids(b) for _, b in zip(range(n_batches),
                                   cycle(DataLoader(_Toy(), 4, shuffle=True,
                                                    seed=7)))]
    for skip in (0, 1, 8, 9, 10, 20):  # within / at / across epoch edges
        resumed = cycle(DataLoader(_Toy(), 4, shuffle=True, seed=7),
                        skip=skip)
        got = [_ids(b) for _, b in zip(range(n_batches - skip), resumed)]
        assert got == ref[skip:], f"skip={skip}"


def test_cycle_skip_loads_nothing():
    """The fast-forward must not touch the dataset (resume from step
    300k must not read 300k batches of images)."""
    loads = []

    class Counting(_Toy):
        def __getitem__(self, i):
            loads.append(i)
            return super().__getitem__(i)

    it = cycle(DataLoader(Counting(), 4, shuffle=True, seed=0), skip=1000)
    assert loads == []
    next(it)
    assert len(loads) == 4  # exactly one batch


def test_grain_loader_state_roundtrip():
    """The production (grain) loader continues its exact stream through
    get_state/set_state — what the trainer writes as loader_state_*.bin
    next to each checkpoint."""
    from onedc_tpu.data.datasets import make_grain_loader

    it = make_grain_loader(_Toy(), 4, shuffle=True, seed=3, num_workers=0)
    for _ in range(3):
        next(it)
    state = it.get_state()
    ref = [_ids(next(it)) for _ in range(3)]

    it2 = make_grain_loader(_Toy(), 4, shuffle=True, seed=3, num_workers=0)
    it2.set_state(state)
    got = [_ids(next(it2)) for _ in range(3)]
    assert got == ref


def test_trainer_loader_state_files_rotate(tmp_path):
    from types import SimpleNamespace

    from onedc_tpu.train.trainer import Trainer

    tr = Trainer.__new__(Trainer)
    tr.ckpt = SimpleNamespace(run_dir=tmp_path, max_checkpoints=2)
    tr.train_iter = SimpleNamespace(get_state=lambda: b"\x01\x02")
    for step in (5, 10, 15):
        tr._save_loader_state(step)
    names = sorted(p.name for p in tmp_path.glob("loader_state_*.bin"))
    assert names == ["loader_state_000010.bin", "loader_state_000015.bin"]
    assert tr._loader_state_path(15).read_bytes() == b"\x01\x02"


def test_fold_in_step_keys_are_resume_invariant():
    import jax

    base = jax.random.PRNGKey(3)
    # an "uninterrupted" run's key at step 17 == a resumed run's key
    k_a = jax.random.fold_in(base, 17)
    k_b = jax.random.fold_in(jax.random.PRNGKey(3), 17)
    assert np.array_equal(np.asarray(k_a), np.asarray(k_b))
