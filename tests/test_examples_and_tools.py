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
