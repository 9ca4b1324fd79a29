"""Dataset encoding semantics on a hermetic synthetic corpus
(SURVEY.md §4 pipeline tier)."""

import numpy as np
import pytest

from dl_vqa_tpu.data import synthetic
from dl_vqa_tpu.data.dataset import VQADataset, encode_answers, encode_question


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("vqa_corpus")
    return synthetic.make_synthetic_corpus(
        str(root), n_train=48, n_val=24, n_images=6, image_size=64,
        max_answers=15,
    )


def test_encode_question_padding_and_unknowns():
    vocab = {"what": 1, "is": 2}
    vec, length = encode_question(["what", "is", "zorp"], vocab, max_len=5)
    assert vec.tolist() == [1, 2, 0, 0, 0]
    assert length == 3


def test_encode_answers_unique_counts():
    vocab = {"yes": 1, "no": 2, "cat": 3}
    idx, val, k = encode_answers(
        ["yes", "yes", "no", "yes", "unknown-answer"], vocab
    )
    assert idx.tolist() == [1, 2]      # np.unique => sorted ids
    assert val.tolist() == [3, 1]
    assert k == 2


def test_encode_answers_all_out_of_vocab():
    idx, val, k = encode_answers(["zzz"], {"yes": 1})
    assert k == 0 and len(idx) == 0


def test_dataset_shapes_and_answerable_filter(corpus):
    train = VQADataset(
        data_paths=corpus["train_paths"],
        other_paths=corpus["paths"],
        answerable_only=True,
    )
    val = VQADataset(
        data_paths=corpus["val_paths"],
        other_paths=corpus["paths"],
        answerable_only=False,
    )
    assert (train.answer_lengths > 0).all()
    assert len(val) == 24
    assert train.questions.shape[0] == len(train)
    assert train.questions.shape[1] == train.max_question_length
    assert train.num_tokens == len(train.question_vocab) + 1
    # 1-based answer ids, 0 is padding only
    active = train.answer_indices[train.answer_values > 0]
    assert (active >= 1).all()


def test_dataset_image_loading(corpus):
    val = VQADataset(
        data_paths=corpus["val_paths"],
        other_paths=corpus["paths"],
    )
    imgs = val.load_images_nhwc(np.array([0, 1, 2, 0]))
    assert imgs.shape == (4, 64, 64, 3)
    assert imgs.dtype == np.float16  # cache storage dtype; upcast on device
    # duplicate index 0 must load the identical image
    np.testing.assert_array_equal(imgs[0], imgs[3])
    chw = val.load_images_chw(np.array([1]))
    assert chw.dtype == np.float32
    np.testing.assert_allclose(
        chw[0].transpose(1, 2, 0), imgs[1].astype(np.float32)
    )
    f32 = val.load_images_nhwc(np.array([1]), dtype=np.float32)
    np.testing.assert_allclose(f32[0], chw[0].transpose(1, 2, 0))


def test_dataset_save_load_roundtrip(corpus, tmp_path):
    val = VQADataset(
        data_paths=corpus["val_paths"],
        other_paths=corpus["paths"],
    )
    path = str(tmp_path / "val_cache.npz")
    val.save(path)
    loaded = VQADataset.load(path)
    np.testing.assert_array_equal(loaded.questions, val.questions)
    np.testing.assert_array_equal(loaded.answer_values, val.answer_values)
    assert loaded.num_tokens == val.num_tokens
    imgs = loaded.load_images_nhwc(np.array([0]))
    assert imgs.shape == (1, 64, 64, 3)


def test_image_cache_matches_torchvision_transform(corpus):
    """The h5 cache must be byte-identical to the reference transform
    (PIL resize/crop + ImageNet normalize, fp16)."""
    torchvision = pytest.importorskip("torchvision")
    import h5py
    import os
    from PIL import Image
    from dl_vqa_tpu.data.images import coco_id_from_filename

    import torchvision.transforms as T

    ref_transform = T.Compose([
        T.Resize(size=int(64 / 0.875)),
        T.CenterCrop(64),
        T.ToTensor(),
        T.Normalize(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
    ])

    base = corpus["paths"]["base_path"]
    img_dir = os.path.join(base, "val2014")
    fname = sorted(os.listdir(img_dir))[0]
    with Image.open(os.path.join(img_dir, fname)) as img:
        expected = ref_transform(img.convert("RGB")).numpy().astype(np.float16)

    with h5py.File(corpus["val_paths"]["processed_imgs"], "r") as fd:
        ids = list(fd["ids"][()])
        row = ids.index(coco_id_from_filename(fname))
        actual = fd["features"][row]

    np.testing.assert_array_equal(actual, expected)


def test_online_mode_cache_not_poisoned_for_h5_reads(corpus, tmp_path):
    """A cache built WITHOUT the h5 row map must refuse h5 image loads
    (previously it silently served row 0 for every sample)."""
    ds = VQADataset(
        data_paths=corpus["val_paths"],
        other_paths=corpus["paths"],
        require_image_cache=False,
    )
    assert not ds.has_image_rows
    with pytest.raises(RuntimeError, match="online-image mode"):
        ds.load_images_nhwc(np.array([0]))

    path = str(tmp_path / "online_cache.npz")
    ds.save(path)
    loaded = VQADataset.load(path)
    assert not loaded.has_image_rows
    with pytest.raises(RuntimeError, match="online-image mode"):
        loaded.load_images_nhwc(np.array([0]))


def test_batcher_shuffle_deterministic_by_seed(corpus):
    from dl_vqa_tpu.data.pipeline import Batcher

    val = VQADataset(
        data_paths=corpus["val_paths"], other_paths=corpus["paths"]
    )
    a = next(iter(Batcher(val, 8, shuffle=True, seed=7, load_images=False)))
    b = next(iter(Batcher(val, 8, shuffle=True, seed=7, load_images=False)))
    c = next(iter(Batcher(val, 8, shuffle=True, seed=8, load_images=False)))
    np.testing.assert_array_equal(a["indices"], b["indices"])
    assert not np.array_equal(a["indices"], c["indices"])
