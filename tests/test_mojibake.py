"""Mojibake repair safety contracts (operators/mojibake.py): exact
generation inversion, clean-text fixed points, termination cap."""

from __future__ import annotations

from pasardassist_spark.operators.mojibake import (
    MAX_PASSES,
    fix_mojibake_text,
)


def _corrupt(s: str, gens: int) -> str:
    for _ in range(gens):
        s = s.encode("utf-8").decode("latin-1")
    return s


def test_single_and_double_generation_inverted():
    orig = "café — naïve 日本語 test ü"
    for gens in (1, 2, 3):
        fixed, n = fix_mojibake_text(_corrupt(orig, gens))
        assert fixed == orig and n == gens


def test_ascii_is_fixed_point():
    s = "plain ascii text, nothing to see"
    fixed, n = fix_mojibake_text(s)
    assert fixed == s and n == 0


def test_clean_latin1_range_text_untouched():
    # 'café' encodes to latin-1 but 0xE9 alone is invalid UTF-8:
    # the loop must NOT touch genuine accented text
    s = "café au lait, naïve déjà vu"
    fixed, n = fix_mojibake_text(s)
    assert fixed == s and n == 0


def test_clean_cjk_untouched():
    s = "日本語のテキスト"
    fixed, n = fix_mojibake_text(s)
    assert fixed == s and n == 0


def test_pass_cap_bounds_work():
    deep = _corrupt("é", MAX_PASSES + 2)
    fixed, n = fix_mojibake_text(deep)
    assert n == MAX_PASSES  # capped, not infinite
    # one more call finishes the job (idempotent convergence)
    fixed2, n2 = fix_mojibake_text(fixed)
    assert fixed2 == "é" and n2 == 2


def test_cp1252_mojibake_repairs():
    """ADVICE r13: 'â€™' (a curly quote through a cp1252 hop) contains €
    and ™, which latin-1 cannot encode — the cp1252 fallback must repair
    it, one generation per hop."""
    from pasardassist_spark.operators.mojibake import fix_mojibake_text

    assert fix_mojibake_text("â€™") == ("’", 1)
    two_hops = (
        "’".encode("utf-8").decode("cp1252")
        .encode("utf-8").decode("cp1252")
    )
    assert fix_mojibake_text(two_hops) == ("’", 2)
    # sloppy direction still refuses genuine non-Western text
    assert fix_mojibake_text("日本語") == ("日本語", 0)
