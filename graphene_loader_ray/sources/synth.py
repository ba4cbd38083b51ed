"""Deterministic synthesis of the KG-pipeline input tables.

Produces (seeded, no wall clock, no external data — FIXTURES.md):

  pages.parquet         (url, warc_ts, html, text, lang)          [input_hint]
  vocab_terms.parquet   gramene-Mongo-style records, flattened    [FIXTURES §2.1]
  vocab_objects.parquet reactome-star-schema rows                 [FIXTURES §2.2]
  vocab_edges.parquet   declared KB relationships                 [FIXTURES §2.3]

The page corpus embeds fact sentences ("<surface> is part of <surface>.")
rendered from the vocabulary, with controlled noise: synonym and case
variants, unknown surfaces, malformed HTML rows, Zipf-skewed head entities
(the H2O/ATP analog of post-import-cypher.txt:6) appearing in >=10% of
pages. The oracle and the engine both consume ONLY the parquet tables —
never this module's internals — so generator ground truth is not the gold
standard; the oracle is.

Everything is a pure function of (n_pages, seed).
"""

from __future__ import annotations

import hashlib
import html as _html
import os
import shutil
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

# ---------------------------------------------------------------- word lists
# Safe words: no full pred phrase (see PRED_PHRASES) can occur inside a name.
ADJ = ["acidic", "basic", "thermal", "soluble", "cyclic", "linear", "reduced",
       "oxidized", "phosphorylated", "methylated", "glycosylated", "native",
       "truncated", "dimeric", "trimeric", "polar"]
NOUN = ["chlorophyll", "sucrose", "starch", "cellulose", "lignin", "auxin",
        "gibberellin", "cytokinin", "ethylene", "abscisate", "jasmonate",
        "brassinosteroid", "flavonoid", "terpenoid", "alkaloid", "carotenoid"]
GERUND = ["signaling", "transport", "biosynthesis", "degradation",
          "assembly", "folding", "elongation", "initiation"]
GENUS = ["Arabidopsis", "Oryza", "Zea", "Sorghum", "Brachypodium", "Setaria",
         "Hordeum", "Triticum", "Glycine", "Medicago", "Solanum", "Vitis"]
SPECIES_EPITHET = ["thaliana", "sativa", "mays", "bicolor", "distachyon",
                   "italica", "vulgare", "aestivum", "max", "truncatula",
                   "lycopersicum", "vinifera"]
NOISE_WORDS = ["the", "sample", "was", "measured", "under", "controlled",
               "conditions", "and", "showed", "significant", "variation",
               "across", "replicates", "während", "señal", "光合作用",
               "числе", "protéine", "growth", "temperature", "assay"]

# head/common entity names — the reference's promiscuous-metabolite analog
HEAD_NAMES = ["H2O [cytosol]", "ATP [cytosol]", "ADP [cytosol]",
              "Pi [cytosol]", "NAD+ [cytosol]", "CoA [cytosol]"]
# blacklist-prefixed but NOT common (the `.*ase.*` exception and the literal one)
HEAD_EXCEPTIONS = ["ATPase complex 1", "UDP-GlcNAc-enolpyruvate [cytosol]"]

PRED_PHRASES = {
    "part_of": "is part of",
    "member_of": "is a member of",
    "catalyzes": "catalyzes",
    "input_of": "is an input of",
    "output_of": "is an output of",
    "occurs_in": "occurs in",
}

ONTOLOGIES = ["GO", "PO", "TO", "EO", "SO", "GRO"]
GO_NAMESPACES = ["biological_process", "molecular_function", "cellular_component"]


# ------------------------------------------------------------------ KB build
@dataclass
class _Ent:
    """Generator-side view of one surface-bearing entity."""
    key: str            # node key ("R123" or "GO:7" / "taxonomy:3" / "genes:12")
    label: str
    name: str
    synonyms: list[str] = field(default_factory=list)

    def surfaces(self) -> list[str]:
        return [self.name] + self.synonyms


@dataclass
class SynthResult:
    tables: dict[str, pa.Table]
    facts: list[tuple[str, str, str]]        # (subj_surface, pred, obj_surface)
    head_fact_idx: list[int]                 # indices of facts naming head entities


def _go_id(i: int) -> int:
    return 1000 + 7 * i


def build_vocab(n_genes: int = 64, seed: int = SEED) -> SynthResult:
    """Build the three vocabulary tables + the expressible-fact list."""
    rng = np.random.default_rng([seed, 1])

    ents: dict[str, _Ent] = {}
    facts: list[tuple[str, str, str]] = []
    head_fact_idx: list[int] = []

    def add_fact(s: str, p: str, o: str, head: bool = False) -> None:
        if head:
            head_fact_idx.append(len(facts))
        facts.append((s, p, o))

    # ---- reactome star schema (vocab_objects) ------------------------------
    obj_rows: list[dict] = []
    edge_rows: list[dict] = []
    next_id = [0]

    def obj(cls: str, name: str, identifier=None, accession=None, ec=None) -> int:
        next_id[0] += 1
        obj_rows.append({"DB_ID": next_id[0], "_displayName": name, "_class": cls,
                         "identifier": identifier, "accession": accession,
                         "ec_number": ec})
        ents[f"R{next_id[0]}"] = _Ent(f"R{next_id[0]}", cls, name)
        return next_id[0]

    def edge(s: int, p: str, o: int, rank=None) -> None:
        edge_rows.append({"subj_id": s, "pred": p, "obj_id": o, "rank": rank})

    n_pathways, n_reactions = 24, 48
    pathways = [obj("Pathway", f"{NOUN[i % 16]} {GERUND[i % 8]} pathway {i}")
                for i in range(n_pathways)]
    reactions = [obj("Reaction", f"{ADJ[i % 16]} {NOUN[(i * 3) % 16]} reaction {i}")
                 for i in range(n_reactions)]

    # simple entities: head/common names + ordinary metabolites + exceptions
    simple = [obj("SimpleEntity", nm) for nm in HEAD_NAMES]
    head_keys = {f"R{i}" for i in simple}
    simple += [obj("SimpleEntity", nm) for nm in HEAD_EXCEPTIONS]
    simple += [obj("SimpleEntity", f"{ADJ[(i * 5) % 16]} {NOUN[(i * 7) % 16]} {i}")
               for i in range(28)]
    complexes = [obj("Complex", f"{NOUN[(i * 5) % 16]} {GERUND[(i * 3) % 8]} complex {i}")
                 for i in range(16)]
    rgps = [obj("ReferenceGeneProduct", f"{NOUN[(i * 11) % 16]} protein {i}",
                identifier=f"GENE{(i * 2) % n_genes:05d}" if i % 3 != 2 else None)
            for i in range(32)]
    catalysts = [obj("CatalystActivity", f"{NOUN[(i * 13) % 16]} {GERUND[(i * 5) % 8]} activity {i}",
                     ec=f"1.1.1.{i}" if i % 4 == 0 else None)
                 for i in range(24)]

    # taxa first ids are referenced by Species rows and DatabaseIdentifier
    n_taxa = 24
    taxa_ids = list(range(1, n_taxa + 1))
    taxa_names = [f"{GENUS[i % 12]} {SPECIES_EPITHET[(i // 12 + i) % 12]}"
                  for i in range(n_taxa)]
    # Species rows share the surface of the first 8 taxa (same surface under
    # two labels — FIXTURES §4 adversarial case)
    species = [obj("Species", taxa_names[i]) for i in range(8)]

    # GO_* decorator rows bridging to GO ontology terms (leading-zero accession)
    n_go = 48
    go_objs = []
    for i in range(24):
        ns_cls = f"GO_{['BiologicalProcess', 'MolecularFunction', 'CellularComponent'][i % 3]}"
        go_objs.append(obj(ns_cls, f"{NOUN[(i * 3) % 16]} {GERUND[i % 8]} go {i}",
                           accession=f"{_go_id(i):07d}"))

    # DatabaseIdentifier rows: effective name = identifier
    # (ReactomeLoader.groovy:129 replaces the name column with `identifier`)
    refdb_ncbi = obj("ReferenceDatabase", "NCBI Taxonomy")
    refdb_ec = obj("ReferenceDatabase", "EC")
    dbidents = []
    for i in range(8):          # taxa bridges (J7: i.name = str(t._id))
        d = obj("DatabaseIdentifier", f"dbident taxon {i}", identifier=str(taxa_ids[i]))
        dbidents.append(d)
        edge(d, "reference_database", refdb_ncbi)
    for i in range(6):          # EC bridges (J7: i.name = e.name)
        d = obj("DatabaseIdentifier", f"dbident ec {i}", identifier=f"1.1.1.{i * 4}")
        dbidents.append(d)
        edge(d, "reference_database", refdb_ec)
    for i in range(0, n_genes, 3):   # gene bridges (J2)
        d = obj("DatabaseIdentifier", f"dbident gene {i}", identifier=f"GENE{i:05d}")
        dbidents.append(d)

    # ---- KB edges ----------------------------------------------------------
    for i, r in enumerate(reactions):
        edge(r, "part_of", pathways[i % n_pathways])                 # m:1
        add_fact(ents[f"R{r}"].name, "part_of", ents[f"R{pathways[i % n_pathways]}"].name)
    for i in range(0, n_pathways - 1, 2):                            # pathway tree
        edge(pathways[i + 1], "part_of", pathways[i])
        add_fact(ents[f"R{pathways[i + 1]}"].name, "part_of", ents[f"R{pathways[i]}"].name)

    for i, r in enumerate(reactions):
        ins = [simple[(i * 2) % len(simple)], simple[(i * 2 + 1) % len(simple)]]
        outs = [simple[(i * 3 + 5) % len(simple)]]
        for k, e in enumerate(ins):
            edge(r, "input", e, rank=k)
            add_fact(ents[f"R{e}"].name, "input_of", ents[f"R{r}"].name,
                     head=f"R{e}" in head_keys)
        for k, e in enumerate(outs):
            edge(r, "output", e, rank=k)
            add_fact(ents[f"R{e}"].name, "output_of", ents[f"R{r}"].name,
                     head=f"R{e}" in head_keys)
        edge(r, "species", species[i % 8])
        add_fact(ents[f"R{r}"].name, "occurs_in", ents[f"R{species[i % 8]}"].name)
        if i + 1 < n_reactions:
            edge(r, "precedes", reactions[i + 1])                    # dynamic pred

    for i, c in enumerate(catalysts):
        r = reactions[i % n_reactions]
        phys = complexes[i % 16] if i % 2 == 0 else simple[(i * 7) % len(simple)]
        edge(r, "catalyst_activity", c)                              # m:1
        edge(c, "physical_entity", phys)                             # m:1
        add_fact(ents[f"R{phys}"].name, "catalyzes", ents[f"R{r}"].name,
                 head=f"R{phys}" in head_keys)

    # ENCODED_BY closure material (post-import-cypher.txt:16): chains of
    # HAS_MEMBER/HAS_COMPONENT/REFERENCE_ENTITY from a catalyst's physical
    # entity down to a ReferenceGeneProduct, at depths 1..3 plus one depth-4
    # chain that must NOT match (bounded *..3).
    for i, cx in enumerate(complexes):
        rgp = rgps[i % len(rgps)]
        if i % 4 == 0:                       # depth 1
            edge(cx, "has_member", rgp, rank=0)
        elif i % 4 == 1:                     # depth 2
            mid = complexes[(i + 7) % 16]
            edge(cx, "has_component", mid, rank=0)
            edge(mid, "reference_entity", rgp)
        elif i % 4 == 2:                     # depth 3
            m1, m2 = complexes[(i + 3) % 16], complexes[(i + 9) % 16]
            edge(cx, "has_member", m1, rank=1)
            edge(m1, "has_member", m2, rank=0)
            edge(m2, "reference_entity", rgp)
        else:                                # depth 4 — beyond the bound
            m1, m2, m3 = (complexes[(i + 1) % 16], complexes[(i + 5) % 16],
                          complexes[(i + 11) % 16])
            edge(cx, "has_member", m1, rank=2)
            edge(m1, "has_member", m2, rank=1)
            edge(m2, "has_member", m3, rank=0)
            edge(m3, "reference_entity", rgp)
        add_fact(ents[f"R{rgps[i % len(rgps)]}"].name, "member_of", ents[f"R{cx}"].name)

    # dangling targets — deferred-edge drop path (Loader.groovy:38-51)
    edge(reactions[0], "input", 999_901, rank=9)
    edge(pathways[0], "part_of", 999_902)

    # ---- vocab_terms -------------------------------------------------------
    term_rows: list[dict] = []

    def term(source: str, _id: int, name: str, label: str, **kw) -> None:
        row = {"_id": _id, "source": source, "name": name, "label": label,
               "synonym": kw.get("synonym", []), "xref": kw.get("xref", []),
               "property_value": kw.get("property_value"),
               "is_a": kw.get("is_a", []), "relationship": kw.get("relationship", []),
               "intersection_of": kw.get("intersection_of", []),
               "namespace": kw.get("namespace"), "subset": kw.get("subset", []),
               "is_obsolete": kw.get("is_obsolete", False),
               "consider": kw.get("consider", []),
               "taxon_id": kw.get("taxon_id"), "gene_id": kw.get("gene_id"),
               "interpro": kw.get("interpro", []),
               "protein_features": kw.get("protein_features", []),
               "location": kw.get("location"),
               "epl_gene_tree": kw.get("epl_gene_tree"),
               "eg_gene_tree": kw.get("eg_gene_tree")}
        term_rows.append(row)
        if not row["is_obsolete"]:
            ents[f"{source}:{_id}"] = _Ent(f"{source}:{_id}", label, name,
                                           list(kw.get("synonym", [])))

    # taxonomy
    for i, (tid, nm) in enumerate(zip(taxa_ids, taxa_names)):
        syns = [f"{nm.split()[0][0]}. {nm.split()[1]}"]
        if i % 5 == 0:
            syns.append(f"{nm} cultivar alpha & beta")     # exercises HTML escaping
        term("taxonomy", tid, nm, "Taxon",
             synonym=syns,
             is_a=[max(1, tid // 2)] if tid > 1 else [],
             property_value=(f"has_rank NCBITaxon:{'species' if i % 2 else 'genus'}"
                             if i % 3 != 2 else None),
             xref=[f"GC_ID:{i}", f"web:taxon-{tid}"])

    # ontologies
    for ont in ONTOLOGIES:
        n_terms = n_go if ont == "GO" else 16
        for i in range(n_terms):
            oid = _go_id(i)
            nm = f"{ont} {NOUN[(i * 3) % 16]} {GERUND[(i * 5) % 8]} {i}"
            rels, inter = [], []
            if i % 3 == 1:
                rels.append(f"part_of {ont}:{_go_id(i - 1):07d} ! {nm}")
            if i % 7 == 3:
                rels.append(f"regulates {ont}:{_go_id(i - 3):07d} ! other")
            if ont == "GO" and i % 11 == 5:
                inter = [str(_go_id(i - 2)),
                         f"part_of GO:{_go_id(i - 4):07d} ! intersection target"]
            term(ont, oid, nm, ont,
                 synonym=[f"{nm} synonym"] if i % 2 == 0 else [],
                 xref=([f"EC:1.1.1.{i}", f"Reactome:R-ALL-{i} legacy {nm}"]
                       if i % 4 == 0 else []),
                 is_a=[_go_id(i - 1)] if i > 0 and i % 2 == 0 else [],
                 # a second leftover collection key → CONSIDER dynamic rel
                 # (OntologyLoader.groovy:56-67); at i=40 the GO target
                 # (idx 38) is obsolete → exercises the dangling path
                 consider=[_go_id(i - 2)] if i % 9 == 4 else [],
                 relationship=rels, intersection_of=inter,
                 namespace=GO_NAMESPACES[i % 3] if ont == "GO" else None,
                 subset=["goslim_plant"] if ont == "GO" and i % 6 == 0 else [],
                 is_obsolete=(i % 13 == 12))

    # domains (InterPro)
    n_domains = 16
    for i in range(n_domains):
        term("domains", i + 1, f"{NOUN[(i * 9) % 16]} binding domain {i}",
             "InterPro",
             xref=[f"type:{'Family' if i % 2 else 'Domain'}"],
             protein_features=[f"PFAM:PF{10000 + i:05d}",
                               f"PANTHER:PTHR{20000 + i}"])

    # genes  (two genes share a name — the nodeNoCache quirk, GeneLoader.groovy:40)
    gene_symbols = []
    for i in range(n_genes):
        sym = f"{GENUS[i % 12][:2].upper()}X{i:04d}" if i != 7 else "ZZX0006"
        gene_symbols.append(sym)
        region_no = (i // 8) % 4
        # ontology xrefs (J5): `ONT:id` or `ONT:id|EVIDENCE`; some targets
        # are obsolete terms (dangle), goslim_goa is dropped entirely by
        # the loaders (GeneLoader.groovy:88), UniProt becomes an Xref node
        gene_xrefs = []
        if i % 4 == 0:
            gene_xrefs.append(f"GO:{_go_id(i % 24)}|IEA")
        elif i % 4 == 1:
            gene_xrefs.append(f"TO:{_go_id(i % 16)}")
        elif i % 4 == 2:
            gene_xrefs.append(f"UniProt:P{10000 + i}")
        if i % 6 == 3:
            gene_xrefs.append("goslim_goa:4000")
        if i == 5:
            gene_xrefs.append("GO:999983")        # dangling ONTOLOGY_REF
        term("genes", i + 1, sym, "Gene",
             xref=gene_xrefs,
             gene_id=f"GENE{i:05d}",
             taxon_id=taxa_ids[i % n_taxa] if i % 17 != 16 else 999_777,
             # gene 11's interpro ids ALL dangle: pins the gated
             # InterProSet→Gene CONTAINS edge (GeneLoader.groovy — link
             # inside if(interproNodeId)); the orphan set node survives
             interpro=([990_001, 990_002] if i == 11 else
                       sorted({(i * 3) % n_domains + 1,
                               (i * 5) % n_domains + 1})),
             protein_features=[f"PFAM:PF{10000 + i % n_domains:05d}",
                               f"coils:Coil"],
             # gene trees (GeneLoader.groovy:37): shared across genes
             # (cached GeneTree nodes), sometimes absent, sometimes both
             epl_gene_tree=(f"EPLGT{i % 12:07d}" if i % 3 != 2 else None),
             eg_gene_tree=(f"EGGT{i % 10:07d}" if i % 4 == 1 else None),
             location={"map": f"assembly{(i % 3) + 1}",
                       "region": f"chr{region_no + 1}",
                       "start": 1000 * (i % 97) + 13, "end": 1000 * (i % 97) + 900,
                       "strand": 1 if i % 2 == 0 else -1})
        if i % 6 == 0:
            tax_ent = ents.get(f"taxonomy:{taxa_ids[i % n_taxa]}")
            if tax_ent is not None and i % 17 != 16:
                add_fact(sym, "occurs_in", tax_ent.name)

    # ontology-surface facts (terms + synonyms appear in pages)
    for ont in ONTOLOGIES:
        n_terms = n_go if ont == "GO" else 16
        for i in range(1, n_terms, 3):
            if i % 13 == 12:
                continue
            e = ents.get(f"{ont}:{_go_id(i)}")
            tgt = ents.get(f"{ont}:{_go_id(i - 1)}")
            if e is not None and tgt is not None:
                add_fact(e.name, "part_of", tgt.name)

    # unknown-surface facts — linker must drop these (quarantine, not crash)
    for i in range(8):
        add_fact(f"mystery compound {i}", "catalyzes",
                 ents[f"R{reactions[i % n_reactions]}"].name)
        add_fact(ents[f"R{simple[i % len(simple)]}"].name, "input_of",
                 f"unknown reaction {i}")

    tables = {
        "vocab_terms": _terms_table(term_rows),
        "vocab_objects": _objects_table(obj_rows),
        "vocab_edges": pa.table({
            "subj_id": pa.array([r["subj_id"] for r in edge_rows], pa.int64()),
            "pred": pa.array([r["pred"] for r in edge_rows], pa.string()),
            "obj_id": pa.array([r["obj_id"] for r in edge_rows], pa.int64()),
            "rank": pa.array([r["rank"] for r in edge_rows], pa.int32()),
        }),
    }
    res = SynthResult(tables=tables, facts=facts, head_fact_idx=head_fact_idx)
    res.ents = ents  # type: ignore[attr-defined]  (used by build_pages)
    return res


def _terms_table(rows: list[dict]) -> pa.Table:
    loc_t = pa.struct([("map", pa.string()), ("region", pa.string()),
                       ("start", pa.int32()), ("end", pa.int32()),
                       ("strand", pa.int8())])
    schema = pa.schema([
        ("_id", pa.int64()), ("source", pa.string()), ("name", pa.string()),
        ("label", pa.string()), ("synonym", pa.list_(pa.string())),
        ("xref", pa.list_(pa.string())), ("property_value", pa.string()),
        ("is_a", pa.list_(pa.int64())), ("relationship", pa.list_(pa.string())),
        ("intersection_of", pa.list_(pa.string())), ("namespace", pa.string()),
        ("subset", pa.list_(pa.string())), ("is_obsolete", pa.bool_()),
        ("consider", pa.list_(pa.int64())),
        ("taxon_id", pa.int64()), ("gene_id", pa.string()),
        ("interpro", pa.list_(pa.int64())),
        ("protein_features", pa.list_(pa.string())), ("location", loc_t),
        ("epl_gene_tree", pa.string()), ("eg_gene_tree", pa.string()),
    ])
    cols = {f.name: [r[f.name] for r in rows] for f in schema}
    return pa.table(cols, schema=schema)


def _objects_table(rows: list[dict]) -> pa.Table:
    schema = pa.schema([("DB_ID", pa.int64()), ("_displayName", pa.string()),
                        ("_class", pa.string()), ("identifier", pa.string()),
                        ("accession", pa.string()), ("ec_number", pa.string())])
    cols = {f.name: [r[f.name] for r in rows] for f in schema}
    return pa.table(cols, schema=schema)


# ------------------------------------------------------------------- pages
_HTML_HEAD = ("<!DOCTYPE html>\n<html lang=\"{lang}\">\n<head><meta charset=\"utf-8\">"
              "<title>{title}</title></head>\n<body>\n"
              "<nav><a href=\"/\">home</a> | <a href=\"/about\">about</a></nav>\n")
_HTML_TAIL = "\n<footer>© example corpus — synthetic fixture</footer>\n</body></html>"

LANGS = ["en"] * 18 + ["es", "de", "zh", "fr"]


def _variant(rng: np.random.Generator, surface: str) -> str:
    """Pick a case variant of a surface (normalizes back to the same key)."""
    r = rng.integers(0, 10)
    if r == 0:
        return surface.upper()
    if r == 1:
        return surface.title()
    return surface


def build_pages(vocab: SynthResult, n_pages: int, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng([seed, 2])
    ents = vocab.ents  # type: ignore[attr-defined]
    facts, head_idx = vocab.facts, vocab.head_fact_idx
    n_facts = len(facts)
    surf_cache: dict[str, list[str]] = {}

    def surfaces_of(name: str) -> list[str]:
        if name not in surf_cache:
            hit = [e for e in ents.values() if e.name == name]
            surf_cache[name] = hit[0].surfaces() if hit else [name]
        return surf_cache[name]

    urls, tss, htmls, texts, langs = [], [], [], [], []
    epoch_us = 1_600_000_000_000_000                     # fixed, not wall clock
    for i in range(n_pages):
        lang = LANGS[i % len(LANGS)]
        k_f = int(rng.integers(2, 6))
        pick: list[int] = []
        for _ in range(k_f):
            if rng.random() < 0.30 and head_idx:         # head-entity skew
                pick.append(head_idx[int(rng.integers(0, len(head_idx)))])
            else:
                pick.append(int(rng.integers(0, n_facts)))
        paras = []
        for fi in pick:
            s, p, o = facts[fi]
            ssurf = _variant(rng, surfaces_of(s)[int(rng.integers(0, len(surfaces_of(s))))])
            osurf = _variant(rng, surfaces_of(o)[int(rng.integers(0, len(surfaces_of(o))))])
            paras.append(f"{ssurf} {PRED_PHRASES[p]} {osurf}.")
        for _ in range(int(rng.integers(1, 4))):         # noise sentences
            w = rng.choice(NOISE_WORDS, size=6)
            paras.append(" ".join(w) + ".")
        order = rng.permutation(len(paras))
        paras = [paras[j] for j in order]
        text = "\n\n".join(paras)

        url = f"https://host{i % 1024}.example/p/{i}"
        title = f"page {i}"
        malformed = (i % 211 == 210)                     # quarantine rows
        if malformed:
            html = (_HTML_HEAD.format(lang=lang, title=title)
                    + "<div>broken — no article element</div>" + _HTML_TAIL)
            text_col = None
        else:
            body = "<article>\n" + "\n".join(
                f"<p>{_html.escape(p2)}</p>" for p2 in paras) + "\n</article>"
            html = _HTML_HEAD.format(lang=lang, title=title) + body + _HTML_TAIL
            text_col = text
        urls.append(url)
        tss.append(epoch_us + i * 1_000_000)
        htmls.append(html.encode("utf-8"))
        texts.append(text_col)
        langs.append(lang)

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


# ------------------------------------------------------------------ images
# Real (structurally valid) image payloads for the multimodal decode stage:
# PNGs are fully valid files (zlib IDAT, correct CRCs); JPEGs carry a real
# SOI/APP0/SOF0 marker sequence; GIFs a real logical screen descriptor.
# 1-in-13 payloads are corrupted (truncated / signature-broken) to exercise
# the quarantine path.

def _png_bytes(w: int, h: int, seed: int) -> bytes:
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)   # 8-bit grayscale
    raw = b"".join(
        b"\x00" + bytes(((seed + 31 * r + c) % 256) for c in range(w))
        for r in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _jpeg_bytes(w: int, h: int) -> bytes:
    import struct
    app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00")
    sof0 = (b"\xff\xc0" + struct.pack(">HBHH", 11, 8, h, w)
            + b"\x01\x01\x11\x00")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif_bytes(w: int, h: int) -> bytes:
    import struct
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def build_images(n_images: int, seed: int = SEED) -> pa.Table:
    urls, payloads, kinds = [], [], []
    for i in range(n_images):
        w = 8 + (i * 7) % 120
        h = 8 + (i * 13) % 90
        kind = ("png", "jpeg", "gif")[i % 3]
        if kind == "png":
            payload = _png_bytes(w, h, seed + i)
        elif kind == "jpeg":
            payload = _jpeg_bytes(w, h)
        else:
            payload = _gif_bytes(w, h)
        if i % 13 == 12:                      # corrupt → quarantine
            payload = payload[:5] if i % 2 else b"\x89PNGnope" + payload[8:]
            kind = "corrupt"
        urls.append(f"https://img.example/i/{i}.{kind}")
        payloads.append(payload)
        kinds.append(kind)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "payload": pa.array(payloads, pa.binary()),
                     "kind": pa.array(kinds, pa.string())})


# ------------------------------------------------------------- audio/video
# Audio clips are REAL RIFF/WAVE files (fmt + data chunks, valid sizes,
# deterministic PCM); the decode stage parses the actual container bytes.
# "Video" uses the repo's own GLV1 fixture container (magic, fps, frame
# count, length-prefixed REAL PNG frames): no codec/demuxer library ships
# in this container, so the demux framing is ours, but every frame payload
# is a real PNG the real image parser reads. 1-in-13 payloads are
# corrupted to exercise quarantine.

def _wav_bytes(n_frames: int, rate: int, channels: int, bits: int,
               seed: int) -> bytes:
    import struct
    block = channels * bits // 8
    data = bytes(((seed + 17 * i) % 256) for i in range(n_frames * block))
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def build_audio(n_clips: int, seed: int = SEED) -> pa.Table:
    urls, payloads, kinds = [], [], []
    for i in range(n_clips):
        rate = (8000, 16000, 44100)[i % 3]
        channels = 1 + i % 2
        n_frames = 40 + (i * 37) % 400
        payload = _wav_bytes(n_frames, rate, channels, 16, seed + i)
        kind = "wav"
        if i % 13 == 12:                      # corrupt → quarantine
            payload = payload[:7] if i % 2 else b"RIFX" + payload[4:]
            kind = "corrupt"
        urls.append(f"https://audio.example/a/{i}.{kind}")
        payloads.append(payload)
        kinds.append(kind)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "payload": pa.array(payloads, pa.binary()),
                     "kind": pa.array(kinds, pa.string())})


def _video_bytes(n_frames: int, fps: int, w: int, h: int,
                 seed: int) -> bytes:
    import struct
    frames = [_png_bytes(w, h, seed + 7 * f) for f in range(n_frames)]
    out = [b"GLV1", struct.pack("<HI", fps, n_frames)]
    for fr in frames:
        out.append(struct.pack("<I", len(fr)))
        out.append(fr)
    return b"".join(out)


def build_videos(n_videos: int, seed: int = SEED) -> pa.Table:
    urls, payloads, kinds = [], [], []
    for i in range(n_videos):
        n_frames = 6 + (i * 5) % 40
        w, h = 8 + (i * 3) % 24, 8 + (i * 5) % 16
        payload = _video_bytes(n_frames, (12, 24, 30)[i % 3], w, h, seed + i)
        kind = "glv"
        if i % 13 == 12:
            payload = payload[:6] if i % 2 else b"GLVX" + payload[4:]
            kind = "corrupt"
        urls.append(f"https://video.example/v/{i}.{kind}")
        payloads.append(payload)
        kinds.append(kind)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "payload": pa.array(payloads, pa.binary()),
                     "kind": pa.array(kinds, pa.string())})


# ------------------------------------------------------------------ caching
FIXTURE_ROOT = os.environ.get("GRAFT_FIXTURE_DIR", "/tmp/graphene_fixtures")
_FIXTURE_VERSION = 9


def synthesize(n_pages: int, seed: int = SEED, n_genes: int = 64,
               root: str = FIXTURE_ROOT, n_page_files: int = 8) -> str:
    """Write (or reuse) the fixture directory for (n_pages, seed, n_genes).

    Pages are written as multiple parquet files so Ray gets real input
    sharding (SURVEY.md §4 — files/row-groups → blocks).
    """
    # bump _FIXTURE_VERSION whenever this module's generation logic changes
    # so stale /tmp caches self-invalidate (CLAUDE.md fixture-cache note).
    # The EFFECTIVE page-file count is part of the tag: sharding changes
    # input striping, so a cache hit across different n_page_files
    # requests would silently benchmark the wrong file layout.
    n_files_eff = max(1, min(n_page_files, n_pages // 50 or 1))
    tag = (f"p{n_pages}_g{n_genes}_s{seed}_f{n_files_eff}"
           f"_v{_FIXTURE_VERSION}")
    outdir = os.path.join(root, tag)
    done = os.path.join(outdir, "_SYNTH_DONE")
    if os.path.exists(done):
        return outdir
    tmp = f"{outdir}.tmp{os.getpid()}"
    os.makedirs(os.path.join(tmp, "pages"), exist_ok=True)
    vocab = build_vocab(n_genes=n_genes, seed=seed)
    for name, tbl in vocab.tables.items():
        pq.write_table(tbl, os.path.join(tmp, f"{name}.parquet"))
    pq.write_table(build_images(max(64, n_pages // 4), seed=seed),
                   os.path.join(tmp, "images.parquet"))
    pq.write_table(build_audio(max(64, n_pages // 8), seed=seed),
                   os.path.join(tmp, "audio.parquet"))
    pq.write_table(build_videos(max(32, n_pages // 16), seed=seed),
                   os.path.join(tmp, "videos.parquet"))
    # the reference's ACTUAL input shape: the reactome side as a MySQL
    # dump (LoadMysqlDump.groovy) — written alongside the parquet twins so
    # the dump reader can be equivalence-tested against them
    from .mysql_dump import write_mysql_dump
    write_mysql_dump({"vocab_objects": vocab.tables["vocab_objects"],
                      "vocab_edges": vocab.tables["vocab_edges"]},
                     os.path.join(tmp, "reactome_dump.sql"))
    pages = build_pages(vocab, n_pages, seed=seed)
    n_files = n_files_eff    # single source of truth with the cache tag
    step = (pages.num_rows + n_files - 1) // n_files
    # the crawl's ACTUAL wire format alongside the parquet twins: one
    # .warc.gz shard per pages file (per-record gzip members), so the
    # WARC reader can be equivalence-tested against the parquet
    from .jsonl import write_jsonl_pages
    from .warc import write_warc
    os.makedirs(os.path.join(tmp, "warc"), exist_ok=True)
    # ... and a JSONL twin (the web-text interchange format), so the
    # JSONL reader gets the same equivalence gate
    os.makedirs(os.path.join(tmp, "jsonl"), exist_ok=True)
    for f in range(n_files):
        shard = pages.slice(f * step, step)
        pq.write_table(shard,
                       os.path.join(tmp, "pages", f"part-{f:05d}.parquet"))
        write_warc(shard.select(["url", "warc_ts", "html"]),
                   os.path.join(tmp, "warc", f"part-{f:05d}.warc.gz"))
        write_jsonl_pages(shard.select(["url", "warc_ts", "html"]),
                          os.path.join(tmp, "jsonl",
                                       f"part-{f:05d}.jsonl.gz"))
    with open(os.path.join(tmp, "_SYNTH_DONE"), "w") as fh:
        fh.write(hashlib.sha256(tag.encode()).hexdigest())
    if os.path.exists(done):          # another process won the race
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        shutil.rmtree(outdir, ignore_errors=True)   # clear any partial dir
        os.replace(tmp, outdir)
    return outdir


# --------------------------------------------- convention-dump (standalone)

def write_convention_dump(path: str, n_objects: int = 600) -> None:
    """Deterministic Reactome-CONVENTION dump: a DatabaseObject star table
    plus decorator / newnodes / relationship satellites whose roles follow
    the reference's name conventions (ReactomeLoader.groovy:81-111) — the
    input surface for the runtime classifier loader
    (pipelines/dump_graph.py). Separate from the fixture dump
    (reactome_dump.sql carries the vocab tables and predates the
    classifier); does NOT affect fixture generation or its cache tag.
    Pure index arithmetic — byte-identical across runs. Written atomically
    (tmp + rename) so concurrent callers are safe."""
    from .mysql_dump import write_mysql_dump

    classes = ["Pathway", "Reaction", "Complex", "SimpleEntity",
               "Person", "StableIdentifier", "Taxon",
               "GO_MolecularFunction", "DatabaseIdentifier",
               "ReferenceDatabase"]
    nouns = ["glycolysis", "photosynthesis", "transport", "signaling",
             "folding", "assembly", "degradation", "elongation"]

    def cls_of(i: int) -> str:
        return classes[i % len(classes)]

    ids = list(range(1, n_objects + 1))
    persons = [i for i in ids if cls_of(i) == "Person"]
    stables = [i for i in ids if cls_of(i) == "StableIdentifier"]
    taxa = [i for i in ids if cls_of(i) == "Taxon"]
    refdbs = [i for i in ids if cls_of(i) == "ReferenceDatabase"]

    def s(v) -> str | None:
        return None if v is None else str(v)

    obj_rows = []
    for i in ids:
        created = persons[i % len(persons)] if i % 3 == 0 else None
        stable = stables[i % len(stables)] if i % 4 == 0 else None
        obj_rows.append((str(i), f"{nouns[i % 8]} object {i}", cls_of(i),
                         s(created), s(stable)))
    tables = {
        "DatabaseObject": pa.table({
            c: pa.array([r[j] for r in obj_rows], pa.string())
            for j, c in enumerate(["DB_ID", "_displayName", "_class",
                                   "created", "stableIdentifier"])}),
        # decorator: m:1 species rel + digit-promoted scalar prop
        "Pathway": pa.table({
            "DB_ID": pa.array([str(i) for i in ids if cls_of(i) == "Pathway"]),
            "hasDiagram": pa.array([str(i % 2) for i in ids
                                    if cls_of(i) == "Pathway"]),
            "species": pa.array([str(taxa[i % len(taxa)]) for i in ids
                                 if cls_of(i) == "Pathway"]),
            "species_class": pa.array(["Taxon" for i in ids
                                       if cls_of(i) == "Pathway"])}),
        # decorator with the GO accession rename + registry zero-strip
        "GO_MolecularFunction": pa.table({
            "DB_ID": pa.array([str(i) for i in ids
                               if cls_of(i) == "GO_MolecularFunction"]),
            "accession": pa.array([f"{(i * 7) % 100000:07d}" for i in ids
                                   if cls_of(i) == "GO_MolecularFunction"]),
            "definition": pa.array([f"function {i}" for i in ids
                                    if cls_of(i) == "GO_MolecularFunction"])}),
        # decorator with the identifier->name rename + m:1 refdb rel
        "DatabaseIdentifier": pa.table({
            "DB_ID": pa.array([str(i) for i in ids
                               if cls_of(i) == "DatabaseIdentifier"]),
            "identifier": pa.array([f"XID:{i:06d}" for i in ids
                                    if cls_of(i) == "DatabaseIdentifier"]),
            "referenceDatabase": pa.array(
                [str(refdbs[i % len(refdbs)]) for i in ids
                 if cls_of(i) == "DatabaseIdentifier"]),
            "referenceDatabase_class": pa.array(
                ["ReferenceDatabase" for i in ids
                 if cls_of(i) == "DatabaseIdentifier"])}),
        # newnodes: minted (Name, value) nodes, raw-string ranks
        "Complex_2_name": pa.table({
            "DB_ID": pa.array([str(i) for i in ids
                               if cls_of(i) == "Complex" for _ in (0, 1)]),
            "name": pa.array([f"{nouns[(i + k) % 8]} complex alias {i % 97}"
                              for i in ids if cls_of(i) == "Complex"
                              for k in (0, 1)]),
            "name_rank": pa.array([str(k) for i in ids
                                   if cls_of(i) == "Complex"
                                   for k in (0, 1)])}),
        # relationships: m:m with int ranks
        "Pathway_2_hasEvent": pa.table({
            "DB_ID": pa.array([str(i) for i in ids
                               if cls_of(i) == "Pathway" for _ in (0, 1)]),
            "hasEvent": pa.array([str(1 + ((i * 11 + k) % n_objects))
                                  for i in ids if cls_of(i) == "Pathway"
                                  for k in (0, 1)]),
            "hasEvent_class": pa.array(["Reaction" for i in ids
                                        if cls_of(i) == "Pathway"
                                        for k in (0, 1)]),
            "hasEvent_rank": pa.array([str(k) for i in ids
                                       if cls_of(i) == "Pathway"
                                       for k in (0, 1)])}),
    }
    tmp = f"{path}.tmp{os.getpid()}"
    write_mysql_dump(tables, tmp)
    os.replace(tmp, path)
