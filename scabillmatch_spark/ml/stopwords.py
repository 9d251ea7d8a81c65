"""Domain stopword list for US legislative bill corpora.

The reference ships a 104-entry extra-stopword file loaded at featurization
time and appended to Spark's english defaults (feature/Utils.scala:190-198,
reading ``stopwords/extra.txt``): US state names and name fragments
("new"/"hampshire"/"jersey" are separate entries because tokenization has
already split multi-word names), territory names, compass words, statute-
code abbreviations (ors/rcw/rsa/nrs/vtd), and legislative boilerplate
(whereas/resolved/section/paragraph...). Without it, every bill pair from
the same state shares dozens of spurious high-TF tokens, which inflates
similarity scores and pollutes k-means blocking.

``BILL_STOPWORDS`` reproduces that list's content exactly, in source order
(including the source file's duplicated ``ohio`` and ``ors`` entries —
harmless to StopWordsRemover, kept so the token SET is byte-identical to
the reference's).
"""

from __future__ import annotations

BILL_STOPWORDS: list[str] = [
    # state names and name fragments
    "alaska", "alabama", "arizona", "california", "colorado", "connecticut",
    "columbia", "delaware", "florida", "georgia", "guam", "hawaii", "iowa",
    "idaho", "illinois", "indiana", "kansas", "kentucky", "louisiana",
    "massachusetts", "maryland", "maine", "michigan", "minnesota",
    "missouri", "mariana", "island", "mississippi", "montana", "national",
    "carolina", "dakota", "nebraska", "new", "hampshire", "jersey",
    "mexico", "nevada", "york", "ohio", "oklahoma", "ohio", "oregon",
    "pennsylvania", "puerto", "rico", "rhode", "tennessee", "texas",
    "utah", "virginia", "virgin", "vermont", "washington", "wisconsin",
    "wyoming",
    # compass words (north carolina / west virginia fragments)
    "north", "south", "east", "west",
    # legislative boilerplate and statute-code abbreviations
    "thence", "ic", "whereas", "member", "district", "mr", "along",
    "united", "states", "ors", "rcw", "vtd", "rsa", "said", "high", "low",
    "members", "order", "shall", "isomers", "ors", "line", "sec",
    "therefore", "year", "resolve", "resolution", "resolved", "resolving",
    "well", "twp", "service", "services", "license", "licenses", "program",
    "programs", "nrs", "note", "notes", "paragraph", "paragraphs",
    "subparagraph", "subparagraphs",
]
