import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import shutil, time, ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from graphene_loader_ray.context import configure
configure()
from graphene_loader_ray.sources.synth import synthesize
from graphene_loader_ray.pipelines.kg import run_kg_pipeline
from graphene_loader_ray.oracle.kg import run_oracle
import pyarrow.parquet as pq
import pandas as pd

d = synthesize(n_pages=400, n_genes=64)
out = "/tmp/kg_e2e_out"
shutil.rmtree(out, ignore_errors=True)
import os; os.makedirs(out)

t0 = time.time()
res = run_kg_pipeline(d, out, n_page_partitions=4)
t1 = time.time()
print(f"pipeline: {t1-t0:.1f}s", {k: v for k, v in res.items() if k != 'counters'})
print("counters:", res["counters"])

oracle = run_oracle(d)

edges = pq.read_table(os.path.join(res["graph_dir"], "edges")).to_pandas()
nodes = pq.read_table(os.path.join(res["graph_dir"], "nodes")).to_pandas()
eng_triples = set(zip(edges["subj"], edges["pred"], edges["obj"]))
gold = oracle["triples"]
print("engine triples:", len(eng_triples), "oracle:", len(gold))
tp = len(eng_triples & gold)
prec = tp / max(1, len(eng_triples)); rec = tp / max(1, len(gold))
print(f"precision={prec:.4f} recall={rec:.4f}")
only_e = eng_triples - gold; only_o = gold - eng_triples
import collections
print("only-e preds:", collections.Counter(p for _, p, _ in only_e))
print("only-o preds:", collections.Counter(p for _, p, _ in only_o))
for e in sorted(only_e)[:5]: print("  E:", e)
for e in sorted(only_o)[:5]: print("  O:", e)

# nodes vs oracle (incl. label union + props)
gold_nodes = {(l, n, c, tuple(labels), props)
              for l, n, c, labels, props in oracle["nodes"].values()}
eng_nodes = set(zip(nodes["label"], nodes["name"], nodes["canonical_id"],
                    (tuple(ls) for ls in nodes["labels"]), nodes["props"]))
print("nodes eng:", len(eng_nodes), "gold:", len(gold_nodes),
      "diff:", len(eng_nodes ^ gold_nodes))
for x in sorted(gold_nodes - eng_nodes)[:4]: print("  N-O:", x)
for x in sorted(eng_nodes - gold_nodes)[:4]: print("  N-E:", x)

# edge props vs oracle
eng_eprops = {(s, p, o): pr for s, p, o, pr in
              zip(edges["subj"], edges["pred"], edges["obj"], edges["props"])
              if pr is not None}
gold_eprops = oracle["edge_props"]
same = sum(1 for k, v in eng_eprops.items() if gold_eprops.get(k) == v)
print(f"edge props: eng {len(eng_eprops)} gold {len(gold_eprops)} equal {same}")
for k in list(set(eng_eprops) ^ set(gold_eprops))[:4]:
    print("  EP:", k, eng_eprops.get(k), "|", gold_eprops.get(k))

# resume: rerun — everything should be skipped
t2 = time.time()
res2 = run_kg_pipeline(d, out, n_page_partitions=4)
print(f"resume: {time.time()-t2:.1f}s kb_skipped={res2['kb_skipped']} "
      f"pages_skipped={res2['page_partitions_skipped']} graph_skipped={res2['graph_skipped']}")
ray.shutdown()
