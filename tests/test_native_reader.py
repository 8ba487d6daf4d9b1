"""C++ reader (native/tfrecord_reader.cc) vs pure-Python codec equivalence."""

import os
import subprocess

import numpy as np
import pytest

from self_attention_tacotron_tpu.data import records as R
from self_attention_tacotron_tpu.data import tfrecord as T

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                   capture_output=True)
    from self_attention_tacotron_tpu.data import native_reader
    assert native_reader.available()


def test_native_crc32c_matches_python():
    from self_attention_tacotron_tpu.data.native_reader import crc32c_native
    for data in [b"", b"123456789", bytes(range(32)), os.urandom(1000)]:
        assert crc32c_native(data) == T.crc32c(data)


def test_native_reader_matches_python(tmp_path):
    from self_attention_tacotron_tpu.data.native_reader import (
        read_examples_native,
    )
    feats = {
        "id": T.int64_feature([42]),
        "neg": T.int64_feature([-7]),
        "key": T.bytes_feature([b"p225_001"]),
        "blob": T.bytes_feature([os.urandom(257)]),
        "vals": T.float_feature([1.5, -2.25, 3.75]),
    }
    path = str(tmp_path / "x.tfrecord")
    T.write_example(feats, path)
    py = next(iter(T.read_examples(path)))
    cc = next(iter(read_examples_native(path)))
    assert set(py) == set(cc)
    for name in py:
        assert py[name][0] == cc[name][0], name
        if py[name][0] == "float":
            np.testing.assert_allclose(py[name][1], cc[name][1])
        else:
            assert py[name][1] == cc[name][1], name


def test_native_reader_on_real_records(tmp_path):
    from self_attention_tacotron_tpu.data.native_reader import (
        read_examples_native,
    )
    rec = R.SourceRecord(id=3, key="p1_001",
                         source=np.array([5, 6, 7], np.int64),
                         source_length=3, text="abc", speaker_id=12, age=23,
                         gender=1, phone=np.array([1, 2], np.int64),
                         phone_length=2, phone_txt="hh ax", lang="EN")
    path = str(tmp_path / "s.tfrecord")
    R.write_source_record(rec, path, with_speaker=True, with_phone=True,
                          with_lang=True)
    out = R.parse_source_record(next(iter(read_examples_native(path))))
    assert out.key == "p1_001"
    np.testing.assert_array_equal(out.source, rec.source)

    codes = np.eye(8, dtype=np.float32)[[1, 3, 5]]
    cpath = str(tmp_path / "c.tfrecord")
    R.write_code_target_record(
        R.CodeTargetRecord(1, "k", "EN", codes, 3, 8), cpath)
    parsed = R.parse_code_target_record(next(iter(read_examples_native(cpath))))
    np.testing.assert_array_equal(parsed.codes, codes)


def test_native_reader_rejects_corruption(tmp_path):
    from self_attention_tacotron_tpu.data.native_reader import (
        read_examples_native,
    )
    path = str(tmp_path / "bad.tfrecord")
    T.write_example({"id": T.int64_feature([1])}, path)
    raw = bytearray(open(path, "rb").read())
    raw[-5] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(read_examples_native(path))
