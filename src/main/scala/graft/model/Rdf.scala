package graft.model

/** RDF term/triple/quad model (SURVEY.md §1.1).
  *
  * The reference manipulates rdflib triples and SPARQL JSON bindings
  * (wikidata_index.py:189-206, get_data_apis_vanilla.py:1018-1021). Engine
  * representation: one row per triple/quad with the term's value in a plain
  * string column for join performance, and optional fidelity fields (term
  * type, language tag, datatype) carried alongside — join on `value`, carry
  * the struct (SURVEY.md §7.3 "Term fidelity").
  */
final case class RdfTerm(
    value: String,
    termType: String = "iri", // iri | literal | bnode
    lang: String = null,
    datatype: String = null)

/** A triple with flattened object-term fidelity fields. */
final case class Triple(
    s: String,
    p: String,
    o: String,
    oType: String = "iri",
    oLang: String = null,
    oDatatype: String = null)

/** A quad: triple + named graph (rdflib Dataset / pyoxigraph Store,
  * enrich_via_sparql.py:24-46). */
final case class Quad(
    g: String,
    s: String,
    p: String,
    o: String,
    oType: String = "iri",
    oLang: String = null,
    oDatatype: String = null)
