"""Language-ID v2: 20-language held-out accuracy through the REAL Spark
scorer, script-route checks on non-Latin text, determinism, and edge
contracts."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from pasardassist_spark.operators import langid as LI

# Held-out sentences — none appear in SEED_CORPORA (different content,
# same language).  sv/da is the canonical hardest pair; both present.
HELD_OUT = {
    "en": "she said that they would come to the house in the morning if the weather was good.",
    "de": "sie sagte dass sie am morgen zum haus kommen würden wenn das wetter gut wäre.",
    "fr": "elle a dit qu'ils viendraient à la maison le matin si le temps était bon.",
    "es": "ella dijo que vendrían a la casa por la mañana si el tiempo era bueno.",
    "pt": "ela disse que eles viriam para a casa de manhã se o tempo estivesse bom.",
    "it": "lei ha detto che sarebbero venuti a casa la mattina se il tempo era buono.",
    "nl": "ze zei dat ze in de ochtend naar het huis zouden komen als het weer goed was.",
    "sv": "hon sa att de skulle komma till huset på morgonen om vädret var bra.",
    "da": "hun sagde at de ville komme til huset om morgenen hvis vejret var godt.",
    "pl": "powiedziała że przyjdą do domu rano jeśli pogoda będzie dobra.",
    "cs": "řekla že přijdou do domu ráno pokud bude dobré počasí.",
    "ro": "ea a spus că vor veni la casă dimineața dacă vremea era bună.",
    "fi": "hän sanoi että he tulisivat taloon aamulla jos sää olisi hyvä.",
    "hu": "azt mondta hogy reggel jönnek a házhoz ha jó lesz az idő.",
    "tr": "hava güzel olursa sabah eve geleceklerini söyledi.",
    "id": "dia mengatakan bahwa mereka akan datang ke rumah di pagi hari jika cuacanya bagus.",
    "vi": "cô ấy nói rằng họ sẽ đến nhà vào buổi sáng nếu thời tiết tốt.",
    "ru": "она сказала что они придут в дом утром если погода будет хорошей.",
    "el": "είπε ότι θα έρχονταν στο σπίτι το πρωί αν ο καιρός ήταν καλός.",
    "zh": "她说如果天气好的话他们早上会来房子。",
}

# Script-routed languages with NO trigram seed at all — the ordered
# script-share rules must carry these.
SCRIPT_ONLY = {
    "ja": "わたしは がっこうに いきます。きょうは てんきが いいです。",
    "ko": "나는 오늘 아침에 학교에 갔습니다. 날씨가 좋았습니다.",
    "ar": "ذهبت إلى المدرسة هذا الصباح وكان الطقس جميلا.",
    "hi": "मैं आज सुबह स्कूल गया और मौसम अच्छा था।",
}


def _predict(spark, texts: dict[str, str]) -> dict[str, tuple[str, int]]:
    df = spark.createDataFrame(
        pd.DataFrame({"want": list(texts), "text": list(texts.values())})
    )
    pred = LI.predict_lang_v2(F.col("text"))
    rows = df.select(
        "want",
        pred["lang"].alias("got"),
        pred["score_milli"].alias("s"),
    ).collect()
    return {r.want: (r.got, r.s) for r in rows}


def test_held_out_accuracy_is_20_of_20(spark):
    got = _predict(spark, HELD_OUT)
    misses = {l: got[l] for l in HELD_OUT if got[l][0] != l}
    assert not misses, f"language-ID misses: {misses}"


def test_script_only_languages_route_by_script(spark):
    got = _predict(spark, SCRIPT_ONLY)
    misses = {l: got[l] for l in SCRIPT_ONLY if got[l][0] != l}
    assert not misses, f"script-route misses: {misses}"


def test_model_derivation_deterministic():
    m1 = LI.weight_matrix()
    m2 = LI._derive_matrix()
    assert m1 == m2
    assert len(m1) == LI.B and all(len(r) == len(LI.LANGS) for r in m1)
    # every weight is a negative milli-nat log-likelihood
    assert all(w < 0 for row in m1 for w in row)


def test_short_and_empty_text_fall_back_to_first_lang(spark):
    got = _predict(spark, {"a": "", "b": "xy", "c": "   "})
    assert got["a"] == ("en", 0)
    assert got["b"] == ("en", 0)
    # "   " is a real 3-char text with ONE trigram the seeds never
    # produce: it scores each language's smoothing floor, so the
    # prediction is the floor argmax (the language with the smallest
    # seed total) — deterministic, mirror-computed here
    floors = LI.weight_matrix()[
        LI._bucket("   ")
    ]
    best = max(range(len(LI.LANGS)), key=lambda i: (floors[i], -i))
    assert got["c"] == (LI.LANGS[best], floors[best])


def test_scores_are_length_capped(spark):
    """Text beyond CAP chars must not change the score (CCNet-style
    prefix classification — at 100 TB the fold cost is bounded)."""
    base = HELD_OUT["de"]
    long = base + " " + "der die und das " * 500
    got = _predict(spark, {"capped": long[: LI.CAP], "full": long})
    # everything past CAP chars is invisible to the scorer
    assert got["capped"] == got["full"]


def test_sql_generators_match_python_model():
    sql = LI.langid_matrix_sql()
    # spot-check the literal: first row of the matrix appears verbatim
    first = "[" + ", ".join(str(w) for w in LI.weight_matrix()[0]) + "]"
    assert sql.startswith("[" + first)
    assert LI.langid_bucket_sql().endswith(f"% {LI.B}) + 1")
