"""End-to-end data-plane golden vs the ACTUAL reference implementation.

The other data tests golden our vectorized transforms against loop semantics
re-derived in test code.  This one goes further: it imports the reference's
``dataset.py`` itself (read-only, ``/root/reference/dataset.py``), runs its
full ``Visuelle2`` preprocessing on a synthetic mini-dataset loaded exactly
the way ``train_dl.py:24-42`` loads it, and asserts our pipeline produces
identical tensors — X/y windows, demand ts, attribute ids, temporal features,
gtrends, and the ``__getitem__`` image path (resize + ToTensor + ImageNet
normalize, ``dataset.py:51-66``).

torchvision is not installed in this container (zero egress), so the four
transforms the reference composes are stubbed with their documented
PIL-backend semantics: ``Resize(size)`` -> ``img.resize((w, h), BILINEAR)``,
``ToTensor`` -> CHW float32 / 255, ``Normalize`` -> per-channel (x-mean)/std,
``Compose`` -> left-to-right chaining.  The stub carries no reference code.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "dataset.py")),
    reason="reference checkout not available")


def _install_torchvision_stub():
    """Minimal torchvision.transforms with the PIL-backend semantics the
    reference relies on (dataset.py:8, :53-58)."""
    from PIL import Image

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size, *a, **k):
            self.size = (size, size) if isinstance(size, int) else tuple(size)

        def __call__(self, img):
            h, w = self.size
            return img.resize((w, h), Image.BILINEAR)

    class CenterCrop:
        def __init__(self, size, *a, **k):
            self.size = (size, size) if isinstance(size, int) else tuple(size)

        def __call__(self, img):
            h, w = self.size
            left = (img.width - w) // 2
            top = (img.height - h) // 2
            return img.crop((left, top, left + w, top + h))

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.uint8)
            return torch.from_numpy(arr).permute(2, 0, 1).float() / 255.0

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, x):
            return (x - self.mean) / self.std

    for cls in (Compose, Resize, CenterCrop, ToTensor, Normalize):
        setattr(transforms, cls.__name__, cls)
    tv.transforms = transforms
    sys.modules.setdefault("torchvision", tv)
    sys.modules["torchvision.transforms"] = transforms


@pytest.fixture(scope="module")
def ref_dataset_mod():
    _install_torchvision_stub()
    spec = importlib.util.spec_from_file_location(
        "ref_dataset", os.path.join(REF, "dataset.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _WritableDF(pd.DataFrame):
    """DataFrame whose ``.values`` is writable.

    The reference mutates ``.values`` in place (``dataset.py:88``), which was
    legal under its pandas 1.x; pandas 3's copy-on-write returns read-only
    views.  Returning a writable copy restores the reference's original
    environment semantics bit-identically without touching its code.
    """

    @property
    def _constructor(self):
        return _WritableDF

    @property
    def values(self):  # noqa: D102 - see class docstring
        v = super().values
        return v if v.flags.writeable else v.copy()


@pytest.fixture(scope="module")
def loaded(synthetic_dataset):
    """Load the synthetic split the exact way the reference's train_dl.py does
    (train_dl.py:24-42)."""
    df = _WritableDF(pd.read_csv(
        os.path.join(synthetic_dataset, "stfore_train.csv"),
        parse_dates=["release_date"]))
    gtrends = pd.read_csv(os.path.join(synthetic_dataset, "vis2_gtrends_data.csv"),
                          index_col=[0], parse_dates=True)
    import json

    dicts = []
    for k in ("category", "color", "fabric"):
        with open(os.path.join(synthetic_dataset, f"{k}_labels.json")) as f:
            dicts.append({kk: int(v) for kk, v in json.load(f).items()})
    return df, gtrends, tuple(dicts)


def _build_ref(ref_dataset_mod, loaded, synthetic_dataset, tmp_path, *,
               demand, output_len):
    df, gtrends, (cat_d, col_d, fab_d) = loaded
    return ref_dataset_mod.Visuelle2(
        sales_df=df,
        img_root=os.path.join(synthetic_dataset, "images"),
        gtrends=gtrends,
        cat_dict=cat_d,
        col_dict=col_d,
        fab_dict=fab_d,
        trend_len=52,
        demand=demand,
        local_savepath=str(tmp_path / f"ref_{demand}_{output_len}.pt"),
        output_len=output_len,
    )


def _ours(synthetic_dataset, *, demand, output_len):
    from visuelle2_tpu.data.pipeline import load_visuelle2

    return load_visuelle2(synthetic_dataset, "train", demand=demand,
                          output_len=output_len, use_cache=False)


@pytest.mark.parametrize("output_len", [1, 10])
def test_stfore_tensors_match_reference(ref_dataset_mod, loaded,
                                        synthetic_dataset, tmp_path, output_len):
    ref = _build_ref(ref_dataset_mod, loaded, synthetic_dataset, tmp_path,
                     demand=False, output_len=output_len)
    ours = _ours(synthetic_dataset, demand=False, output_len=output_len)

    # Reference TensorDataset layout: (X, y, cat, col, fab, store, temporal,
    # gtrends) — dataset.py:165-169.
    X, y, cat, col, fab, store, temporal, gt = ref.dataset.tensors
    np.testing.assert_array_equal(ours.X, X.numpy())
    np.testing.assert_array_equal(ours.y, y.numpy())
    np.testing.assert_array_equal(ours.cat, cat.numpy())
    np.testing.assert_array_equal(ours.col, col.numpy())
    np.testing.assert_array_equal(ours.fab, fab.numpy())
    np.testing.assert_array_equal(ours.store, store.numpy())
    np.testing.assert_allclose(ours.temporal, temporal.numpy(), atol=1e-6)
    np.testing.assert_allclose(ours.gtrends, gt.numpy(), atol=1e-6)
    np.testing.assert_array_equal(ours.split_idx, ref.split_idx.numpy())


def test_demand_tensors_match_reference(ref_dataset_mod, loaded,
                                        synthetic_dataset, tmp_path):
    ref = _build_ref(ref_dataset_mod, loaded, synthetic_dataset, tmp_path,
                     demand=True, output_len=12)
    ours = _ours(synthetic_dataset, demand=True, output_len=12)

    ts, cat, col, fab, store, temporal, gt = ref.dataset.tensors
    np.testing.assert_array_equal(ours.ts, ts.numpy())
    np.testing.assert_array_equal(ours.cat, cat.numpy())
    np.testing.assert_allclose(ours.gtrends, gt.numpy(), atol=1e-6)
    np.testing.assert_allclose(ours.temporal, temporal.numpy(), atol=1e-6)


def test_getitem_image_matches_reference(ref_dataset_mod, loaded,
                                         synthetic_dataset, tmp_path):
    """__getitem__'s decode->resize->normalize (dataset.py:51-66) vs our
    decode-once uint8 store + on-device normalize."""
    from visuelle2_tpu.data.images import ImageStore, normalize_images

    ref = _build_ref(ref_dataset_mod, loaded, synthetic_dataset, tmp_path,
                     demand=True, output_len=12)
    ours = _ours(synthetic_dataset, demand=True, output_len=12)
    store = ImageStore.build(os.path.join(synthetic_dataset, "images"),
                             ours.image_paths, cache_file=None)

    for idx in (0, len(ours) - 1):
        _, ref_img = ref[idx]  # CHW float
        got = np.asarray(normalize_images(store.gather([idx])))[0]  # HWC
        np.testing.assert_allclose(
            got.transpose(2, 0, 1), ref_img.numpy(), atol=1e-5)
