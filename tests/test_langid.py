"""Language-ID model checks, including the planted-corpus invariant the
driver oracle `langid_planted` depends on."""

from __future__ import annotations

from pii_detector_spark.functions.langmodels import LANGS, predict_lang


def test_planted_sentences_predict_their_language():
    # must stay in sync with __spark_entry__._LANG_PLANTS: the DuckDB oracle
    # hardcodes these labels, so the model must actually produce them
    from __spark_entry__ import _LANG_PLANTS

    assert tuple(lang for lang, _ in _LANG_PLANTS) == LANGS
    for lang, sentence in _LANG_PLANTS:
        assert predict_lang(sentence) == lang, (lang, sentence)


def test_seed_language_separation():
    from pii_detector_spark.functions.langmodels import SEED_CORPUS

    for lang, sents in SEED_CORPUS.items():
        for s in sents:
            assert predict_lang(s) == lang, (lang, s)


def test_empty_and_numeric_fall_back_deterministically():
    # empty → 'unk' sentinel; letterless text falls back deterministically
    assert predict_lang("") == "unk"
    assert predict_lang("12345 67890") == predict_lang("12345 67890")
    assert predict_lang("12345 67890") in LANGS + ("unk",)
