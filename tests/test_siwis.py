import numpy as np

from self_attention_tacotron_tpu.config import default_hparams
from self_attention_tacotron_tpu.data.preprocess.codes import SiwisCodes
from self_attention_tacotron_tpu.data.records import (
    parse_code_target_record, parse_source_record,
)
from self_attention_tacotron_tpu.data.tfrecord import read_examples


def test_siwis_corpus_roundtrip(tmp_path):
    corpus = tmp_path / "siwis"
    out = tmp_path / "out"
    corpus.mkdir()
    out.mkdir()
    (corpus / "siwis-speaker-info.txt").write_text(
        "EN-26\tEN\nFR-08\tFR\n".replace("\t", " "))
    rng = np.random.RandomState(0)
    for spk in ("EN-26", "FR-08"):
        for i in range(2):
            codes = " ".join(str(c) for c in rng.randint(0, 10, 6))
            (corpus / f"{spk}_{i:03d}.txt").write_text(
                f"bonjour le monde {i}\t{codes}\n")

    hp = default_hparams().replace(phoneme="none")
    proc = SiwisCodes(str(corpus), str(out), 0, 10, hp)
    records = proc.list_files()
    assert len(records) == 4
    langs = {r.key: r.lang for r in records}
    assert langs["EN-26_000"] == "EN"
    assert langs["FR-08_001"] == "FR"

    proc.process_sources(records, num_workers=1)
    proc.process_targets(records, num_workers=1)

    src = parse_source_record(
        next(iter(read_examples(str(out / "FR-08_000.source.tfrecord")))))
    assert src.lang == "FR"
    assert src.speaker_id == 1  # enumeration order of speaker info
    tgt = parse_code_target_record(
        next(iter(read_examples(str(out / "FR-08_000.target.tfrecord")))))
    assert tgt.codes.shape == (6, 10)
    assert tgt.lang == "FR"
