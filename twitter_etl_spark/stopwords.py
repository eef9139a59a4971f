"""Frozen Snowball Spanish stopword list.

The reference removes Spanish stopwords from tweet text with
``tm::removeWords(., tm::stopwords("spanish"))`` (reference
``main.R:101``); ``tm::stopwords("spanish")`` is the Snowball
stemmer project's Spanish list. We freeze that list here as data
(SURVEY.md §4.3.2) so that:

- the Spark side can compile it into ONE ``regexp_replace``
  alternation — a pure column expression that stays inside
  whole-stage codegen (no UDF, no tokenize/rejoin round-trip that
  would change whitespace), and
- the DuckDB oracle can use the *same* literal pattern, keeping the
  two engines hash-comparable.

The pattern ``\\b(w1|w2|...)\\b`` replaced with "" reproduces
``tm::removeWords`` semantics: whole-word deletion leaving
punctuation and whitespace in place. Dialect caveat (SURVEY.md
§4.3.3, ``cleaning.py``): Java's ``\\b`` is Unicode-aware while
RE2's is ASCII-only, so the engines diverge on accented words at
word edges (and this list contains ``más``/``qué``/``está``…) —
the dialects agree only on ASCII corpora. The divergence is
fuzz-characterized in ``tests/test_cross_engine_fuzz.py`` and
resolved in favor of reference-faithful (Unicode/ICU-like)
semantics, with oracle corpora constrained to ASCII. The list
contains no regex metacharacters.
"""

from __future__ import annotations

SPANISH_STOPWORDS: tuple[str, ...] = (
    "de", "la", "que", "el", "en", "y", "a", "los", "del", "se", "las",
    "por", "un", "para", "con", "no", "una", "su", "al", "lo", "como",
    "más", "pero", "sus", "le", "ya", "o", "este", "sí", "porque",
    "esta", "entre", "cuando", "muy", "sin", "sobre", "también", "me",
    "hasta", "hay", "donde", "quien", "desde", "todo", "nos", "durante",
    "todos", "uno", "les", "ni", "contra", "otros", "ese", "eso",
    "ante", "ellos", "e", "esto", "mí", "antes", "algunos", "qué",
    "unos", "yo", "otro", "otras", "otra", "él", "tanto", "esa",
    "estos", "mucho", "quienes", "nada", "muchos", "cual", "poco",
    "ella", "estar", "estas", "algunas", "algo", "nosotros", "mi",
    "mis", "tú", "te", "ti", "tu", "tus", "ellas", "nosotras",
    "vosotros", "vosotras", "os", "mío", "mía", "míos", "mías", "tuyo",
    "tuya", "tuyos", "tuyas", "suyo", "suya", "suyos", "suyas",
    "nuestro", "nuestra", "nuestros", "nuestras", "vuestro", "vuestra",
    "vuestros", "vuestras", "esos", "esas", "estoy", "estás", "está",
    "estamos", "estáis", "están", "esté", "estés", "estemos", "estéis",
    "estén", "estaré", "estarás", "estará", "estaremos", "estaréis",
    "estarán", "estaría", "estarías", "estaríamos", "estaríais",
    "estarían", "estaba", "estabas", "estábamos", "estabais",
    "estaban", "estuve", "estuviste", "estuvo", "estuvimos",
    "estuvisteis", "estuvieron", "estuviera", "estuvieras",
    "estuviéramos", "estuvierais", "estuvieran", "estuviese",
    "estuvieses", "estuviésemos", "estuvieseis", "estuviesen",
    "estando", "estado", "estada", "estados", "estadas", "estad",
    "he", "has", "ha", "hemos", "habéis", "han", "haya", "hayas",
    "hayamos", "hayáis", "hayan", "habré", "habrás", "habrá",
    "habremos", "habréis", "habrán", "habría", "habrías", "habríamos",
    "habríais", "habrían", "había", "habías", "habíamos", "habíais",
    "habían", "hube", "hubiste", "hubo", "hubimos", "hubisteis",
    "hubieron", "hubiera", "hubieras", "hubiéramos", "hubierais",
    "hubieran", "hubiese", "hubieses", "hubiésemos", "hubieseis",
    "hubiesen", "habiendo", "habido", "habida", "habidos", "habidas",
    "soy", "eres", "es", "somos", "sois", "son", "sea", "seas",
    "seamos", "seáis", "sean", "seré", "serás", "será", "seremos",
    "seréis", "serán", "sería", "serías", "seríamos", "seríais",
    "serían", "era", "eras", "éramos", "erais", "eran", "fui",
    "fuiste", "fue", "fuimos", "fuisteis", "fueron", "fuera", "fueras",
    "fuéramos", "fuerais", "fueran", "fuese", "fueses", "fuésemos",
    "fueseis", "fuesen", "siendo", "sido", "tengo", "tienes", "tiene",
    "tenemos", "tenéis", "tienen", "tenga", "tengas", "tengamos",
    "tengáis", "tengan", "tendré", "tendrás", "tendrá", "tendremos",
    "tendréis", "tendrán", "tendría", "tendrías", "tendríamos",
    "tendríais", "tendrían", "tenía", "tenías", "teníamos", "teníais",
    "tenían", "tuve", "tuviste", "tuvo", "tuvimos", "tuvisteis",
    "tuvieron", "tuviera", "tuvieras", "tuviéramos", "tuvierais",
    "tuvieran", "tuviese", "tuvieses", "tuviésemos", "tuvieseis",
    "tuviesen", "teniendo", "tenido", "tenida", "tenidos", "tenidas",
    "tened",
)

#: Flat alternation, word-boundary anchored (the direct
#: ``tm::removeWords`` shape). Kept for reference and equivalence
#: tests; the engine uses the trie-factored form below.
STOPWORD_PATTERN_FLAT: str = r"\b(" + "|".join(SPANISH_STOPWORDS) + r")\b"


def _trie_pattern(words: tuple[str, ...]) -> str:
    """Factor the word list into a prefix-trie regex.

    A flat 308-way alternation makes the regex engine re-try every
    branch at every position; the trie shares prefixes so matching
    is O(branch-width x depth) — measured ~4x faster in Spark on the
    fixture corpus, with byte-identical output (continuation
    branches are emitted before the word-end branch, so longest
    match still wins at shared prefixes, same as flat list order
    under Java's Unicode ``\\b``).
    """
    import re as _re

    trie: dict = {}
    for w in words:
        node = trie
        for ch in w:
            node = node.setdefault(ch, {})
        node[""] = {}

    def emit(node: dict) -> str:
        keys = [k for k in node if k != ""]
        end = "" in node
        alts = [_re.escape(k) + emit(node[k]) for k in sorted(keys)]
        if end:
            alts.append("")
        if len(alts) == 1 and not end and not alts[0].startswith("(?:"):
            return alts[0]
        return "(?:" + "|".join(alts) + ")"

    return emit(trie)


#: The engine's stopword pattern — trie-factored, word-boundary
#: anchored; used identically on the Spark and DuckDB sides.
STOPWORD_PATTERN: str = r"\b" + _trie_pattern(SPANISH_STOPWORDS) + r"\b"
