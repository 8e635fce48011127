"""RDF N-Triples export / import for the constructed KG.

The materialize stage speaks OpenKE txt (:mod:`kgforge.io_openke` —
the reference's file layout); N-Triples (W3C, https://www.w3.org/TR/
n-triples/) is the interchange format every RDF toolchain reads, so a
KG built here can be bulk-loaded into Jena / Virtuoso / GraphDB or
set-diffed against public KGs without custom glue.

Scale design
------------
Writer and reader are fully distributed: ``df.write.text`` /
``spark.read.text`` over a *directory* of part files — N-Triples has
no count header, so unlike :func:`kgforge.io_openke.
write_triples_txt_spark` there is no driver-side file concatenation at
all; a 100 TB export stays a pure executor-side job and the part files
land sorted by (s, p, o) ranges (``repartitionByRange`` +
``sortWithinPartitions``). ``repartitionByRange`` samples its range
boundaries, so per-file contents can shift between sessions; what IS
guaranteed is that the concatenation of the part files in name order
is deterministically sorted — that concatenation is the diffable
artifact.
Term encoding runs on JVM built-ins (``url_encode`` / ``url_decode``
— percent-encoding whose output alphabet is IRI-safe), never per-row
Python, so the export plan is one range shuffle and zero Python
workers.

Encoding contract
-----------------
Canonical entity / relation strings become absolute IRIs under
private-scheme bases (default ``kg:e/`` for entities, ``kg:p/`` for
predicates): ``<kg:e/Jo%C3%A3o%20Silva> <kg:p/works_at> <kg:e/Acme> .``
``url_encode`` percent-encodes every character N-Triples forbids
inside ``<...>`` (space, angle brackets, quotes, backslash, control
characters); form-encoding's ``+``-for-space is post-processed to
``%20`` so the IRIs are RFC-3986-faithful for external consumers
(Jena/Virtuoso decode per RFC 3986, where ``+`` is a literal plus —
a literal ``+`` in a term encodes as ``%2B``, so the mapping stays
unambiguous). ``url_decode`` inverts it exactly, so ``read_ntriples
(write_ntriples(df))`` is the identity on any UTF-8 canonical
strings, including newlines and the delimiters themselves. The
readers additionally require each term to start with its configured
base (the base is compiled into the line regex): lines written under
different bases — or foreign N-Triples files — are dropped like any
other non-matching line instead of parsing into silently mangled
terms.

Terms must be non-null (canonical strings are, by construction — the
extract stage coalesces text to ``""``): a null term nulls its IRI,
``concat_ws`` then drops it, and the lenient reader skips the
malformed line — so nulls would round-trip to silent row loss rather
than an error. Filter or coalesce first if the source can hold nulls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_ntriples", "read_ntriples", "write_nquads", "read_nquads"]

_ENTITY_BASE = "kg:e/"
_PREDICATE_BASE = "kg:p/"
_GRAPH_BASE = "kg:g/"


def _iri(col: str, base: str):
    # url_encode emits form-encoding's '+' for space; rewrite to '%20'
    # (still JVM-only, still inverted exactly by url_decode — a literal
    # '+' encodes as '%2B') so the IRIs are RFC-3986-faithful.
    return F.concat(
        F.lit("<" + base),
        F.replace(F.url_encode(F.col(col)), F.lit("+"), F.lit("%20")),
        F.lit(">"),
    )


def _re_escape(s: str) -> str:
    """Escape a base string for literal use inside the line regex."""
    import re

    return re.escape(s)


def write_ntriples(
    df: DataFrame,
    path: str,
    n_partitions: int = 16,
    entity_base: str = _ENTITY_BASE,
    predicate_base: str = _PREDICATE_BASE,
) -> None:
    """``(s, p, o)`` string DataFrame → directory of ``part-*`` N-Triples
    files, globally range-sorted by (s, p, o).

    All three positions are written as IRIs (this engine's object
    position holds canonical *entity* strings — RDF literals are out of
    scope and documented as such). Ascending key ranges land in
    ascending partition ids, so the concatenation of the part files in
    name order is a fully sorted, reproducible export.
    """
    lines = (
        df.select("s", "p", "o")
        .repartitionByRange(n_partitions, "s", "p", "o")
        .sortWithinPartitions("s", "p", "o")
        .select(
            F.concat_ws(
                " ",
                _iri("s", entity_base),
                _iri("p", predicate_base),
                _iri("o", entity_base),
                F.lit("."),
            ).alias("value")
        )
    )
    lines.write.mode("overwrite").text(path)


def read_ntriples(
    spark: SparkSession,
    path: str,
    entity_base: str = _ENTITY_BASE,
    predicate_base: str = _PREDICATE_BASE,
) -> DataFrame:
    """Distributed parse of an N-Triples directory (or single file) back
    to an ``(s, p, o)`` string DataFrame.

    Grammar subset matching what :func:`write_ntriples` emits (three
    IRIREFs + terminating dot); rows that don't match — blank lines,
    comments, terms under a different base — are dropped, mirroring
    the lenient header handling of :func:`kgforge.io_openke.
    read_triples_spark`. The configured bases are part of the line
    regex, so each capture group is exactly the encoded remainder and
    ``url_decode`` inverts the writer.
    """
    eb, pb = _re_escape(entity_base), _re_escape(predicate_base)
    pat = rf"^<{eb}([^>]*)> <{pb}([^>]*)> <{eb}([^>]*)> \.$"

    def _term(group: int):
        return F.url_decode(F.regexp_extract(F.trim(F.col("value")), pat, group))

    raw = spark.read.text(path)
    return (
        raw.where(F.trim(F.col("value")).rlike(pat))
        .select(
            _term(1).alias("s"),
            _term(2).alias("p"),
            _term(3).alias("o"),
        )
    )


def write_nquads(
    df: DataFrame,
    path: str,
    n_partitions: int = 16,
    entity_base: str = _ENTITY_BASE,
    predicate_base: str = _PREDICATE_BASE,
    graph_base: str = _GRAPH_BASE,
) -> None:
    """``(s, p, o, g)`` string DataFrame → N-Quads directory — the
    provenance-carrying sibling of :func:`write_ntriples` (W3C
    N-Quads: a 4th graph-label IRI per statement).

    In this engine the graph term is the provenance key — typically
    ``conv_id`` (the lineage column materialize already tracks) — so a
    downstream RDF store can partition or filter statements by source
    conversation, matching the `kg_provenance` query's semantics. Same
    layout/encoding contract as the triple writer: one range Exchange
    on (s, p, o, g), sorted diffable parts, JVM-only encoding.
    """
    lines = (
        df.select("s", "p", "o", "g")
        .repartitionByRange(n_partitions, "s", "p", "o", "g")
        .sortWithinPartitions("s", "p", "o", "g")
        .select(
            F.concat_ws(
                " ",
                _iri("s", entity_base),
                _iri("p", predicate_base),
                _iri("o", entity_base),
                _iri("g", graph_base),
                F.lit("."),
            ).alias("value")
        )
    )
    lines.write.mode("overwrite").text(path)


def read_nquads(
    spark: SparkSession,
    path: str,
    entity_base: str = _ENTITY_BASE,
    predicate_base: str = _PREDICATE_BASE,
    graph_base: str = _GRAPH_BASE,
) -> DataFrame:
    """Distributed N-Quads parse back to ``(s, p, o, g)`` — the exact
    inverse of :func:`write_nquads`, with the same lenient row filter
    (including the base-prefix gate) as :func:`read_ntriples`."""
    eb, pb, gb = _re_escape(entity_base), _re_escape(predicate_base), _re_escape(graph_base)
    pat = rf"^<{eb}([^>]*)> <{pb}([^>]*)> <{eb}([^>]*)> <{gb}([^>]*)> \.$"

    def _term(group: int):
        return F.url_decode(F.regexp_extract(F.trim(F.col("value")), pat, group))

    raw = spark.read.text(path)
    return (
        raw.where(F.trim(F.col("value")).rlike(pat))
        .select(
            _term(1).alias("s"),
            _term(2).alias("p"),
            _term(3).alias("o"),
            _term(4).alias("g"),
        )
    )
