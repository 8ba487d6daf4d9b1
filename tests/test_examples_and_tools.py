import glob
import json
import os

from self_attention_tacotron_tpu.cli.speaker_selection import (
    cross_check, filter_speakers_by_accent, select_keys,
)
from self_attention_tacotron_tpu.config import default_hparams
from self_attention_tacotron_tpu.models.tacotron import (
    decoder_config_from_hparams, tacotron_model_factory,
)

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def test_example_configs_load_and_build():
    paths = sorted(glob.glob(os.path.join(EXAMPLES, "*", "*.json")))
    assert len(paths) >= 7
    for path in paths:
        hp = default_hparams()
        hp.parse_json_file(path)
        # config selects a known model/encoder/decoder combination
        model = tacotron_model_factory(hp)
        cfg = decoder_config_from_hparams(hp)
        assert cfg["num_sources"] in (1, 2)
        if "self-attention" in os.path.basename(path):
            assert hp.encoder.startswith("SelfAttentionCBHG")
            assert cfg["use_transformer"]


def test_speaker_selection_tools(tmp_path):
    accents = tmp_path / "accents.txt"
    accents.write_text("ID ACCENTS\n225 English\n234 Scottish\n226 English\n")
    spk = filter_speakers_by_accent(str(accents), ["English"])
    assert spk == ["225", "226"]

    keys = ["p225_001", "p234_001", "p226_002", "p999_001"]
    assert select_keys(keys, spk) == ["p225_001", "p226_002"]

    existing = ["p225_001.source.tfrecord", "p226_002.source.tfrecord"]
    assert cross_check(keys, existing) == ["p225_001", "p226_002"]


def test_speaker_selection_cli(tmp_path):
    from self_attention_tacotron_tpu.cli.speaker_selection import main
    kl = tmp_path / "keys.txt"
    kl.write_text("p225_001\np234_001\n")
    sl = tmp_path / "speakers.txt"
    sl.write_text("225 English\n")
    rc = main(["select", str(kl), str(sl)])
    assert rc == 0
    assert (tmp_path / "keys.txt.selected").read_text().strip() == "p225_001"


def test_example_key_lists_ship_and_parse():
    """Every example corpus ships the reference's canonical split lists
    (reference: examples/ljspeech/train.csv et al.)."""
    from self_attention_tacotron_tpu.data.dataset import load_key_list
    for corpus in ("ljspeech", "vctk", "codes", "codes_siwis"):
        for name in ("train.csv", "validation.csv", "test.csv"):
            path = os.path.join(EXAMPLES, corpus, name)
            keys = load_key_list(path)
            assert keys, path
            assert all(k.strip() == k for k in keys)
    # full CSV lists for the VQ-code corpora
    assert load_key_list(os.path.join(EXAMPLES, "codes", "full_csvs",
                                      "train.csv"))
    assert load_key_list(os.path.join(EXAMPLES, "codes_siwis", "full_csvs",
                                      "siwis_train.csv"))


def test_codes_siwis_tacotron_config_loads():
    hp = default_hparams()
    hp.parse_json_file(os.path.join(EXAMPLES, "codes_siwis", "tacotron.json"))
    assert hp.dataset == "codes_siwis.dataset.DatasetSource"
    assert hp.max_iters == 3000 and hp.num_speakers == 4
    assert len(hp.average_mel_level_db) == 80
    tacotron_model_factory(hp)


def test_speaker_selection_shipped_data():
    """The shipped speaker_selection data drives the selection tools
    (reference: speaker_selection/accents.txt, Am_Ca_Au_En.txt)."""
    seldir = os.path.join(EXAMPLES, "..", "speaker_selection")
    english = filter_speakers_by_accent(
        os.path.join(seldir, "accents.txt"), ["English"])
    assert "225" in english and "234" not in english
    with open(os.path.join(seldir, "Am_Ca_Au_En.txt")) as f:
        lines = [line.split()[0] for line in f if line.strip()]
    assert lines  # speaker ids usable with select_keys
    assert select_keys([f"p{lines[0]}_001", "p999_001"], lines) == [
        f"p{lines[0]}_001"]


def test_preprocess_split_key_lists(tmp_path):
    from self_attention_tacotron_tpu.cli.preprocess import \
        write_split_key_lists
    keys = [f"k{i:03d}" for i in range(100)]
    write_split_key_lists(keys, str(tmp_path), "0.8:0.1:0.1", seed=1)
    train = (tmp_path / "train.csv").read_text().split()
    val = (tmp_path / "validation.csv").read_text().split()
    test = (tmp_path / "test.csv").read_text().split()
    assert len(train) == 80 and len(val) == 10 and len(test) == 10
    assert sorted(train + val + test) == keys  # disjoint cover
    # deterministic
    write_split_key_lists(keys, str(tmp_path), "0.8:0.1:0.1", seed=1)
    assert (tmp_path / "train.csv").read_text().split() == train
