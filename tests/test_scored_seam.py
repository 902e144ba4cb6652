"""The scored-model seam (round-3 VERDICT #7): lang_id / quality_score
accept a pluggable classifier through an Arrow-batched mapInPandas
contract — validated here with a deterministic fake, the same pattern
that legitimizes the multimodal codec seam (no model libraries exist in
this sandbox; the Spark-side plumbing is what must be real)."""

import pandas as pd
import pytest

from crba_etl_spark.operators.text_analysis import lang_id, quality_score


@pytest.fixture()
def docs(spark):
    rows = [(i, f"{'ab ' * (i % 7)}document {i}") for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(4)


# NOTE: the fake models are built by factories (closures) rather than
# module-level functions: cloudpickle ships closures BY VALUE to the
# executors — exactly how a real model callable must travel too (a
# module-level function from the driver script wouldn't be importable
# on an executor).
def make_fake_lang_model():
    def fake_lang_model(texts: pd.Series) -> pd.DataFrame:
        # deterministic, content-derived — stands in for fastText.predict
        return pd.DataFrame(
            {
                "lang_pred": ["xx" if len(t) % 2 else "yy" for t in texts],
                "lang_conf": [round((len(t) % 10) / 10, 2) for t in texts],
            }
        )

    return fake_lang_model


def make_fake_quality_model():
    def fake_quality_model(texts: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {"quality": [round(min(len(t), 100) / 100, 2) for t in texts]}
        )

    return fake_quality_model


def test_lang_model_seam_scores_every_row(spark, docs):
    fake_lang_model = make_fake_lang_model()
    got = {r.doc_id: (r.lang_pred, r.lang_conf) for r in
           lang_id(docs, model=fake_lang_model).collect()}
    exp_pdf = docs.toPandas().sort_values("doc_id")
    exp_scores = fake_lang_model(exp_pdf["text"])
    exp = {
        int(d): (p, c)
        for d, p, c in zip(
            exp_pdf["doc_id"], exp_scores["lang_pred"], exp_scores["lang_conf"]
        )
    }
    assert got == exp  # every row scored, ids never misaligned


def test_quality_model_seam_scores_every_row(spark, docs):
    fake_quality_model = make_fake_quality_model()
    got = {r.doc_id: r.quality for r in
           quality_score(docs, model=fake_quality_model).collect()}
    exp_pdf = docs.toPandas().sort_values("doc_id")
    exp = {
        int(d): q
        for d, q in zip(exp_pdf["doc_id"], fake_quality_model(exp_pdf["text"])["quality"])
    }
    assert got == exp


def test_seam_rejects_contract_violations(spark, docs):
    from py4j.protocol import Py4JJavaError

    def wrong_cols(texts):
        return pd.DataFrame({"language": ["en"] * len(texts)})

    def wrong_len(texts):
        return pd.DataFrame({"lang_pred": ["en"], "lang_conf": [1.0]})

    for bad in (wrong_cols, wrong_len):
        with pytest.raises((Py4JJavaError, Exception), match="model contract"):
            lang_id(docs, model=bad).collect()


def test_heuristic_flag_is_explicit(spark, docs):
    # default stays the oracle-checked heuristic (same schema as before)
    assert lang_id(docs).columns == ["doc_id", "lang_pred"]
    # opting OUT of the heuristic without providing a model fails loudly
    with pytest.raises(ValueError, match="requires a model"):
        lang_id(docs, heuristic=False)
    with pytest.raises(ValueError, match="requires a model"):
        quality_score(docs, heuristic=False)
