"""TLFM dataset tests against a synthetic tif tree with reference-style
filenames (pattern per tlfm_dataset.py:62-110), plus loader and transforms."""

import os

import numpy as np
import pytest

from multi_stylegan_tpu.data import (
    BatchLoader,
    SyntheticTLFMDataset,
    TLFMDataset,
    elastic_deformation,
    normalize_0_1,
)


@pytest.fixture(scope="module")
def tif_tree(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("tlfm")
    pos = root / "Pos0"
    pos.mkdir()
    rng = np.random.default_rng(0)
    # 2 traps x 4 timesteps x 3 z x {BF, GFP}; 16-bit tifs like the microscope
    for trap in (1, 2):
        for t in range(4):
            for z in range(3):
                for ch, lo, hi in (("BF0", 3000, 12000), ("GFP", 100, 2500)):
                    img = rng.integers(lo, hi, size=(32, 32)).astype(np.uint16)
                    # name layout implied by the reference's parse positions
                    # (tlfm_dataset.py:71-84, 118): channel token
                    # ("-BF0_"/"-GFP"), z token ("_00z_"), TIME at
                    # split("_")[-5], TRAP in the last "-" field - the sort
                    # key (last-dash-field + [-5]) is then trap-major,
                    # time-minor, which is what makes same-trap windows
                    # consecutive
                    name = (
                        f"exp-{ch}_00{z}_{t:04d}_s_x_y_stack-trap{trap:04d}.tif"
                    )
                    cv2.imwrite(str(pos / name), img)
    return str(root)


def test_tlfm_scanning_and_windows(tif_tree):
    ds = TLFMDataset(tif_tree, no_rfp=True, random_horizontal_flip=0.0)
    # per (z, trap): 4 frames -> 2 overlapping length-3 windows
    # 3 z x 2 traps x 2 = 12 sequences
    assert len(ds) == 12
    item = ds[0]
    assert item.shape == (2, 3, 32, 32)
    assert item.dtype == np.float32
    # BF per-frame min-max: every frame spans [0, 1]
    for f in range(3):
        assert abs(item[0, f].min()) < 1e-6 and abs(item[0, f].max() - 1) < 1e-6
    # GFP fixed-range normalization keeps values in [0, 1]
    assert item[1].min() >= 0.0 and item[1].max() <= 1.0


def test_tlfm_same_trap_constraint(tif_tree):
    ds = TLFMDataset(tif_tree, no_rfp=True)
    for bf_paths, gfp_paths, _ in ds.samples:
        traps = {p[p.find("trap"): p.find("trap") + 8] for p in bf_paths}
        assert len(traps) == 1
        zs = {("_000_" in p, "_001_" in p, "_002_" in p) for p in bf_paths}
        assert len(zs) == 1  # one z-slice per sequence


def test_tlfm_non_overlapping(tif_tree):
    ds = TLFMDataset(tif_tree, no_rfp=True, overlap=False)
    # stride-3 windows: [0:3] same-trap, [3:6] crosses traps and is rejected
    # (the reference's windowing does the same) -> 1 per z
    assert len(ds) == 3


def test_normalize_0_1_per_frame():
    x = np.stack([np.full((4, 4), 5.0), np.arange(16.0).reshape(4, 4)])
    y = normalize_0_1(np.stack([x])[0])
    assert y.shape == (2, 4, 4)
    np.testing.assert_allclose(y[1].min(), 0.0)
    np.testing.assert_allclose(y[1].max(), 1.0)


def test_batch_loader_epochs():
    ds = SyntheticTLFMDataset(n_samples=10, resolution=(16, 16))
    loader = BatchLoader(ds, batch_size=4, num_workers=1, seed=1)
    assert len(loader) == 2  # drop_last
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].shape == (4, 2, 3, 16, 16)
    # reshuffles between epochs
    b2 = list(loader)
    assert len(b2) == 2


def test_batch_loader_too_small_dataset_raises():
    ds = SyntheticTLFMDataset(n_samples=2, resolution=(8, 8))
    with pytest.raises(ValueError):
        BatchLoader(ds, batch_size=4)


def test_elastic_deformation_shape_and_range():
    import jax

    img = jax.numpy.asarray(
        np.random.default_rng(0).uniform(size=(2, 3, 24, 24)).astype(np.float32)
    )
    out = elastic_deformation(jax.random.key(0), img, alpha=10, sigma=4)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()
    # border-clamped sampling keeps the value range
    assert float(out.min()) >= float(img.min()) - 1e-5
    assert float(out.max()) <= float(img.max()) + 1e-5


def test_trap_weights_map():
    from multi_stylegan_tpu.data import make_trap_weights_map

    w = make_trap_weights_map(resolution=(64, 48), inside_weight=3.0)
    assert w.shape == (64, 48) and w.dtype == np.float32
    np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-6)
    # trap center carries more weight than the corners
    assert w[32, 24] > 2 * w[0, 0]
    # smooth taper: no jump larger than the ramp resolution allows
    assert np.abs(np.diff(w, axis=0)).max() < 0.5
    # symmetric about the default (centered) trap
    np.testing.assert_allclose(w, w[::-1, :], atol=1e-5)
    np.testing.assert_allclose(w, w[:, ::-1], atol=1e-5)
    with pytest.raises(ValueError):
        make_trap_weights_map(trap_fraction=0.0)
    with pytest.raises(ValueError):
        make_trap_weights_map(inside_weight=-1.0)


@pytest.mark.slow  # ~6 min: two full train-step compiles; the cheap
# finiteness variant (test_train_step.test_trap_weight_map_variant)
# stays in the fast tier
def test_trap_weights_map_through_train_step():
    """End-to-end: the built map routes through the pixel losses when the
    trap_weight flag is on and changes them (reference
    model_wrapper.py:290-291, 405-406)."""
    import jax
    import jax.numpy as jnp

    from multi_stylegan_tpu.data import make_trap_weights_map
    from multi_stylegan_tpu.models import (
        Discriminator,
        Generator,
        tiny_discriminator_config,
        tiny_generator_config,
    )
    from multi_stylegan_tpu.models.config import TrainingConfig
    from multi_stylegan_tpu.train import StepFlags, create_train_state, make_train_step

    gcfg, dcfg = tiny_generator_config(), tiny_discriminator_config()
    g, d = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=4)
    state = create_train_state(jax.random.key(0), g, d, cfg)
    batch = jax.random.uniform(jax.random.key(1), (4, 2, 3, *gcfg.resolution))

    trap = make_trap_weights_map(resolution=gcfg.resolution, inside_weight=4.0)
    step_w = make_train_step(g, d, cfg, trap_weights_map=jnp.asarray(trap))
    step_n = make_train_step(g, d, cfg)

    on = jnp.asarray(True)
    off = jnp.asarray(False)
    flags_on = StepFlags(wrong_order=off, trap_weight=on, do_cut_mix=off)
    flags_off = StepFlags.off()

    _, m_weighted = jax.jit(step_w)(state, batch, flags_on)
    _, m_flag_off = jax.jit(step_w)(state, batch, flags_off)
    _, m_no_map = jax.jit(step_n)(state, batch, flags_on)

    # flag off or no map => identical pixel losses; flag on with map differs
    np.testing.assert_allclose(
        float(m_flag_off["loss_discriminator_real_pixel_wise"]),
        float(m_no_map["loss_discriminator_real_pixel_wise"]), rtol=1e-6)
    assert not np.isclose(
        float(m_weighted["loss_discriminator_real_pixel_wise"]),
        float(m_flag_off["loss_discriminator_real_pixel_wise"]), rtol=1e-4)
    for v in m_weighted.values():
        assert np.isfinite(float(v))


def test_teacher_fixture_contract():
    """TeacherTLFMDataset: realizable 'real' data from a frozen random
    generator, same [C, T, H, W]-in-[0,1] contract as the TLFM dataset."""
    from multi_stylegan_tpu.data import TeacherTLFMDataset
    from multi_stylegan_tpu.models import Generator, tiny_generator_config

    g = Generator(tiny_generator_config())
    ds = TeacherTLFMDataset(n_samples=6, resolution=(32, 32), generator=g,
                            batch=4, compute_dtype="float32")
    assert len(ds) == 6
    s = ds[0]
    assert s.shape == (2, 3, 32, 32)
    assert s.min() >= 0.0 and s.max() <= 1.0 + 1e-6
    # distinct samples (the teacher actually varies with z)
    assert np.abs(ds[0] - ds[1]).max() > 1e-3
