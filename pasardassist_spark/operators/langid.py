"""Language identification v2 — a hashed char-trigram multinomial
classifier over 20 languages (the fasttext/CCNet shape), replacing the
4-language marker-stopword heuristic as the primary router.

Model: train-small / score-big (the IVF discipline,
operators/similarity.py).  The embedded per-language seed corpora below
(a few natural sentences each — written for this module, public
commonplace text) are reduced AT IMPORT, deterministically, to a dense
``B x L`` integer weight matrix: char trigrams of the lowercased seed
hash into ``B = 1024`` buckets (16-bit md5 prefix — the cross-engine
hash this repo standardizes on, queries/curation.py:_QC_HEX16) and
``w[b][l] = round(1000 * ln((count_bl + 1) / (total_l + B)))`` is the
add-one-smoothed multinomial log-likelihood in milli-nats.  Buckets the
seed never hits carry each language's smoothing floor automatically, so
scoring needs no sparse-miss branch: ONE ``element_at`` per trigram.

Scoring is pure JVM column math (zero Python, zero shuffle): the doc's
first ``CAP`` chars -> trigram array -> ``F.aggregate`` fold adding the
bucket's weight row into a 20-long vector -> struct-argmax (ties to the
earlier language, the predict_lang contract).  Hash collisions are part
of the model, exactly as in fasttext's hashing trick.

Non-Latin scripts route FIRST through the ordered script-share rules
(operators/text.py:SCRIPT_RULES — kana before Han, then hangul,
cyrillic, arabic, greek, devanagari): character classes are decisive
where trigram statistics are wasteful, and ja/ko/ar/hi have no Latin
seed at all.

Accuracy is pinned by tests/test_langid.py on held-out sentences in all
20 languages (plus script-routed ja/ko/ar/hi) — 20/20 at B=1024, and
the margin survives B=512 (tested during development).

The weight matrix is a folded literal (Catalyst ConstantFolding turns
the 1024x20 CreateArray into one Literal), so at 100 TB the model ships
inside the plan itself — no broadcast table, no join, scan-speed
scoring.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, functions as F

from pasardassist_spark.operators.text import SCRIPT_RULES, script_counts

__all__ = [
    "B",
    "CAP",
    "LANGS",
    "SEED_CORPORA",
    "weight_matrix",
    "trigram_scores",
    "predict_lang_v2",
    "langid_matrix_sql",
]

B = 1024          # hash buckets (collisions are part of the model)
# Chars scored per document (CAP-2 trigrams).  Sized for the interpreted
# HOF-step cost (Spark higher-order functions are CodegenFallback, so the
# fold pays ~5-10us per trigram): 126 trigrams classify as reliably as
# 512 (held-out sentences are <100 chars and 20/20) at ~0.3ms/doc —
# ~0.06us/byte of document, cheaper per byte than any codec in this repo.
# The script-share route reads the same capped prefix, so the whole
# model touches CAP chars of each document, period.
CAP = 128

SEED_CORPORA = {
    'en': (
        'the quick brown fox jumps over the lazy dog. '
        'this is not the only thing that we have to say about what happened there and when it was done. '
        'it was a cold day in november and the children were walking to school with their books. '
        'what time is it? i do not know where my keys are but i think they are on the table in the kitchen.'
    ),
    'de': (
        'der schnelle braune fuchs springt über den faulen hund. '
        'das ist nicht die einzige sache die wir über das was dort geschehen ist und wann es getan wurde zu sagen haben. '
        'es war ein kalter tag im november und die kinder gingen mit ihren büchern zur schule. '
        'wie spät ist es? ich weiß nicht wo meine schlüssel sind aber ich glaube sie liegen auf dem tisch in der küche.'
    ),
    'fr': (
        'le renard brun rapide saute par dessus le chien paresseux. '
        "ce n'est pas la seule chose que nous avons à dire sur ce qui s'est passé là-bas et quand cela a été fait. "
        "c'était une journée froide de novembre et les enfants marchaient vers l'école avec leurs livres. "
        "quelle heure est-il? je ne sais pas où sont mes clés mais je pense qu'elles sont sur la table dans la cuisine."
    ),
    'es': (
        'el rápido zorro marrón salta sobre el perro perezoso. '
        'esta no es la única cosa que tenemos que decir sobre lo que pasó allí y cuándo se hizo. '
        'era un día frío de noviembre y los niños caminaban a la escuela con sus libros. '
        '¿qué hora es? no sé dónde están mis llaves pero creo que están en la mesa de la cocina.'
    ),
    'pt': (
        'a rápida raposa marrom pula sobre o cão preguiçoso. '
        'esta não é a única coisa que temos a dizer sobre o que aconteceu lá e quando foi feito. '
        'era um dia frio de novembro e as crianças caminhavam para a escola com seus livros. '
        'que horas são? não sei onde estão as minhas chaves mas acho que estão na mesa da cozinha.'
    ),
    'it': (
        'la veloce volpe marrone salta sopra il cane pigro. '
        "questa non è l'unica cosa che abbiamo da dire su ciò che è successo lì e quando è stato fatto. "
        'era una fredda giornata di novembre e i bambini camminavano verso la scuola con i loro libri. '
        'che ore sono? non so dove sono le mie chiavi ma penso che siano sul tavolo in cucina.'
    ),
    'nl': (
        'de snelle bruine vos springt over de luie hond. '
        'dit is niet het enige dat we te zeggen hebben over wat daar is gebeurd en wanneer het werd gedaan. '
        'het was een koude dag in november en de kinderen liepen met hun boeken naar school. '
        'hoe laat is het? ik weet niet waar mijn sleutels zijn maar ik denk dat ze op de tafel in de keuken liggen.'
    ),
    'sv': (
        'den snabba bruna räven hoppar över den lata hunden. '
        'detta är inte det enda vi har att säga om vad som hände där och när det gjordes. '
        'det var en kall dag i november och barnen gick till skolan med sina böcker. '
        'vad är klockan? jag vet inte var mina nycklar är men jag tror att de ligger på bordet i köket. '
        'han ville att de skulle komma och se vad som hade hänt i staden eftersom det var viktigt. '
        'det var en fin dag och vädret var bra så vi tog en promenad längs vägen ner till sjön.'
    ),
    'da': (
        'den hurtige brune ræv springer over den dovne hund. '
        'dette er ikke det eneste vi har at sige om hvad der skete der og hvornår det blev gjort. '
        'det var en kold dag i november og børnene gik i skole med deres bøger. '
        'hvad er klokken? jeg ved ikke hvor mine nøgler er men jeg tror de ligger på bordet i køkkenet. '
        'han ville gerne have at de skulle komme og se hvad der var sket i byen. '
        'det var en dejlig dag og vejret var godt så vi gik en tur langs vejen ned til søen.'
    ),
    'pl': (
        'szybki brązowy lis przeskakuje nad leniwym psem. '
        'to nie jest jedyna rzecz którą mamy do powiedzenia o tym co się tam wydarzyło i kiedy to zostało zrobione. '
        'był zimny listopadowy dzień a dzieci szły do szkoły ze swoimi książkami. '
        'która jest godzina? nie wiem gdzie są moje klucze ale myślę że są na stole w kuchni.'
    ),
    'cs': (
        'rychlá hnědá liška skáče přes líného psa. '
        'to není jediná věc kterou musíme říci o tom co se tam stalo a kdy to bylo uděláno. '
        'byl studený listopadový den a děti šly do školy se svými knihami. '
        'kolik je hodin? nevím kde jsou moje klíče ale myslím že jsou na stole v kuchyni. '
        'chtěl aby přišli a viděli co se stalo ve městě protože to bylo důležité. '
        'dnes ráno jsem četl knihu a potom jsem šel do práce a přišel jsem domů večer.'
    ),
    'ro': (
        'vulpea maro rapidă sare peste câinele leneș. '
        'aceasta nu este singurul lucru pe care îl avem de spus despre ceea ce s-a întâmplat acolo și când a fost făcut. '
        'era o zi rece de noiembrie și copiii mergeau la școală cu cărțile lor. '
        'cât este ceasul? nu știu unde sunt cheile mele dar cred că sunt pe masa din bucătărie. '
        'el a vrut ca ei să vină și să vadă ce s-a întâmplat în oraș pentru că era important.'
    ),
    'fi': (
        'nopea ruskea kettu hyppää laiskan koiran yli. '
        'tämä ei ole ainoa asia joka meidän on sanottava siitä mitä siellä tapahtui ja milloin se tehtiin. '
        'oli kylmä marraskuun päivä ja lapset kävelivät kouluun kirjojensa kanssa. '
        'paljonko kello on? en tiedä missä avaimeni ovat mutta luulen että ne ovat pöydällä keittiössä.'
    ),
    'hu': (
        'a gyors barna róka átugorja a lusta kutyát. '
        'nem ez az egyetlen dolog amit el kell mondanunk arról hogy mi történt ott és mikor történt. '
        'hideg novemberi nap volt és a gyerekek az iskolába sétáltak a könyveikkel. '
        'hány óra van? nem tudom hol vannak a kulcsaim de azt hiszem az asztalon vannak a konyhában.'
    ),
    'tr': (
        'hızlı kahverengi tilki tembel köpeğin üzerinden atlar. '
        'orada ne olduğu ve ne zaman yapıldığı hakkında söyleyeceğimiz tek şey bu değil. '
        'soğuk bir kasım günüydü ve çocuklar kitaplarıyla okula yürüyorlardı. '
        'saat kaç? anahtarlarımın nerede olduğunu bilmiyorum ama sanırım mutfaktaki masanın üzerindeler.'
    ),
    'id': (
        'rubah coklat yang cepat melompati anjing yang malas. '
        'ini bukan satu-satunya hal yang harus kami katakan tentang apa yang terjadi di sana dan kapan itu dilakukan. '
        'itu adalah hari yang dingin di bulan november dan anak-anak berjalan ke sekolah dengan buku-buku mereka. '
        'jam berapa sekarang? saya tidak tahu di mana kunci saya tetapi saya pikir mereka ada di atas meja di dapur.'
    ),
    'vi': (
        'con cáo nâu nhanh nhẹn nhảy qua con chó lười biếng. '
        'đây không phải là điều duy nhất chúng tôi phải nói về những gì đã xảy ra ở đó và khi nào nó được thực hiện. '
        'đó là một ngày lạnh trong tháng mười một và những đứa trẻ đi bộ đến trường với sách của chúng. '
        'mấy giờ rồi? tôi không biết chìa khóa của tôi ở đâu nhưng tôi nghĩ chúng ở trên bàn trong bếp.'
    ),
    'ru': (
        'быстрая коричневая лиса прыгает через ленивую собаку. '
        'это не единственное что мы должны сказать о том что там произошло и когда это было сделано. '
        'был холодный ноябрьский день и дети шли в школу со своими книгами. '
        'который час? я не знаю где мои ключи но думаю что они на столе на кухне.'
    ),
    'el': (
        'η γρήγορη καφέ αλεπού πηδάει πάνω από το τεμπέλικο σκυλί. '
        'αυτό δεν είναι το μόνο πράγμα που έχουμε να πούμε για το τι συνέβη εκεί και πότε έγινε. '
        'ήταν μια κρύα μέρα του νοεμβρίου και τα παιδιά περπατούσαν στο σχολείο με τα βιβλία τους. '
        'τι ώρα είναι? δεν ξέρω πού είναι τα κλειδιά μου αλλά νομίζω ότι είναι στο τραπέζι στην κουζίνα.'
    ),
    'zh': (
        '敏捷的棕色狐狸跳过了懒惰的狗。关于那里发生了什么以及何时完成我们要说的不止这一件事。那是十一月的一个寒冷的日子孩子们带着书走路去学校。 现在几点了？我不知道我的钥匙在哪里但我想它们在厨房的桌子上。'
    ),
}


LANGS: tuple[str, ...] = tuple(SEED_CORPORA)


def _bucket(tri: str) -> int:
    return int(hashlib.md5(tri.encode("utf-8")).hexdigest()[:4], 16) % B


def _derive_matrix() -> list[list[int]]:
    counts = {lang: [0] * B for lang in LANGS}
    totals = {lang: 0 for lang in LANGS}
    for lang, seed in SEED_CORPORA.items():
        t = seed.lower()
        for i in range(len(t) - 2):
            counts[lang][_bucket(t[i : i + 3])] += 1
            totals[lang] += 1
    return [
        [
            round(1000 * math.log((counts[lang][b] + 1) / (totals[lang] + B)))
            for lang in LANGS
        ]
        for b in range(B)
    ]


_MATRIX: list[list[int]] = _derive_matrix()


def weight_matrix() -> list[list[int]]:
    """The derived B x L milli-nat weight matrix (row b = bucket b)."""
    return _MATRIX


_MATRIX_JSON: str = "[" + ", ".join(
    "[" + ", ".join(str(w) for w in row) + "]" for row in _MATRIX
) + "]"


def _matrix_col() -> Column:
    # from_json over ONE string literal: a 21k-node CreateArray tree
    # costs seconds of py4j construction + per-plan analysis, while this
    # is 2 expression nodes that ConstantFolding reduces to the same
    # Literal once per plan (verified folded; ~5 ms).
    return F.from_json(F.lit(_MATRIX_JSON), "array<array<bigint>>")


def trigram_scores(text: Column) -> Column:
    """array<long> of per-language milli-nat scores for the document's
    first CAP chars; all-zero when the text has fewer than 3 chars.

    EVALUATION-COST CONTRACT: expressions captured inside a
    higher-order-function lambda re-evaluate PER ELEMENT, and
    lambda-bearing subtrees are excluded from codegen subexpression
    elimination (the predict_lang lesson, operators/text.py:99).  So
    every heavy expression here enters an HOF only as its INPUT —
    trigrams are built by zipping three shifted slices of the char
    array (inputs, evaluated once per row), the lambdas touch nothing
    but their element variables, and the weight matrix is a folded
    Literal (free to reference)."""
    t = F.lower(F.substring(text, 1, CAP))
    chars = F.split(t, "")
    m = F.greatest(F.size(chars) - F.lit(2), F.lit(0))
    c1 = F.slice(chars, F.lit(1), m)
    c2 = F.slice(chars, F.lit(2), m)
    c3 = F.slice(chars, F.lit(3), m)
    tris = F.zip_with(
        F.zip_with(c1, c2, lambda a, b: F.concat(a, b)),
        c3,
        lambda ab, c: F.concat(ab, c),
    )
    mat = _matrix_col()
    init = F.array(*[F.lit(0).cast("long")] * len(LANGS))

    def step(acc: Column, tr: Column) -> Column:
        b = (
            F.conv(F.substring(F.md5(tr), 1, 4), 16, 10).cast("long")
            % F.lit(B)
        ).cast("int")
        return F.zip_with(
            acc, F.element_at(mat, b + F.lit(1)), lambda a, w: a + w
        )

    return F.aggregate(tris, init, step)


def argmax_lang(scores: Column) -> Column:
    """struct(lang, score_milli) argmax with ties resolving to the
    earlier language in LANGS (the predict_lang contract).  ``scores``
    is referenced exactly ONCE — as the zip_with input — so the fold
    behind it is never re-evaluated per candidate."""
    idx = F.array(*[F.lit(i) for i in range(len(LANGS))])
    cands = F.zip_with(
        scores,
        idx,
        lambda s, i: F.struct(s.alias("s"), (-i).alias("np"), i.alias("i")),
    )
    best = F.array_max(cands)
    lang = F.element_at(
        F.array(*[F.lit(lang) for lang in LANGS]), best["i"] + F.lit(1)
    )
    return F.struct(lang.alias("lang"), best["s"].alias("score_milli"))


def script_override(text: Column, lang: Column) -> Column:
    """Ordered script-share routing (SCRIPT_RULES) wrapped around a
    Latin-model prediction.  ``lang`` should be a cheap reference (a
    struct-field of a materialized column), because the when-chain
    references it once per rule fall-through.  Share counts read the
    same CAP-char prefix the trigram model scores — 8 regex passes over
    128 chars instead of the whole document."""
    head = F.lower(F.substring(text, 1, CAP))  # = the oracle's v2docs.t
    total = F.length(F.regexp_replace(head, r"\s", ""))
    counts = script_counts(head)
    out = lang
    for rl, _lo, _hi, thr in reversed(SCRIPT_RULES):
        out = F.when(
            (total > 0) & (counts[rl] >= thr * total), F.lit(rl)
        ).otherwise(out)
    return out


def predict_lang_v2(text: Column) -> Column:
    """struct(lang, score_milli): ordered script-share routing first
    (SCRIPT_RULES), the trigram model for Latin-script text.  The score
    is always the trigram score (script-routed rows keep it for
    diagnostics).

    When you need BOTH fields, materialize this struct in one select
    and expand it in a second (CollapseProject keeps multi-referenced
    expensive aliases materialized, so the fold runs once per row);
    extracting a single field from the fresh struct is also
    single-evaluation (SimplifyExtractValueOps)."""
    tri_best = argmax_lang(trigram_scores(text))
    return F.struct(
        script_override(text, tri_best["lang"]).alias("lang"),
        tri_best["score_milli"].alias("score_milli"),
    )


# ----------------------------------------------------------- oracle SQL ---

_HEX16_TRI = (
    "((instr('0123456789abcdef', substr(md5(tri), 1, 1)) - 1) * 4096"
    " + (instr('0123456789abcdef', substr(md5(tri), 2, 1)) - 1) * 256"
    " + (instr('0123456789abcdef', substr(md5(tri), 3, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr(md5(tri), 4, 1)) - 1))"
)


def langid_matrix_sql() -> str:
    """The weight matrix as a DuckDB list-of-lists literal — generated
    from the SAME derived model as the Spark side so they cannot
    drift."""
    rows = ", ".join(
        "[" + ", ".join(str(w) for w in row) + "]" for row in _MATRIX
    )
    return "[" + rows + "]"


def langid_bucket_sql() -> str:
    """1-based bucket index expression over a column named ``tri``."""
    return f"({_HEX16_TRI} % {B}) + 1"
