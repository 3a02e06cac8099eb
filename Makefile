# Developer entry points (mirrors the reference repo's Makefile role).

.PHONY: test test-fast parity parity-all parity-sf01 parity-hostile bench smoke \
        fetch-grid ulp-canary close scale-data scale-curve parity-scale

fetch-grid:      ## best-effort: pull the real LINZ NTv2 grid when network exists
	-python tools/fetch_linz_grid.py
	# on success the grid lands in data/ and the real-grid tolerance
	# test auto-unskips (tests pick up data/ntv2_tolerance_report.json);
	# without network this is a no-op failure, ignored by the leading -

close: fetch-grid ulp-canary parity-all parity-hostile parity-sf01 test bench  ## full round-close gate sequence

ulp-canary:      ## interpolated-percentile allowlist + engine bit-parity probe
	python tools/ulp_canary.py ULP_CANARY.json

test:            ## full suite, no -x (the pre-commit gate)
	python -m pytest tests/ -q

test-fast:       ## quick signal: catalog + loaders + plan shapes
	python -m pytest tests/test_catalog.py tests/test_loader_schema.py \
	  tests/test_plan_shapes.py -q

parity:          ## driver-style oracle gate at sf0.01 (what the driver runs)
	GEOETL_TEST_SF_DIR=/root/testdata/sf0.01 \
	  python -m pytest tests/test_oracle_parity.py -q

parity-all:      ## every catalog query vs DuckDB -> PARITY_ALL.json
	python tools/parity_all.py /root/testdata/sf0.01 PARITY_ALL.json

parity-sf01:     ## 10x scale-drift sweep -> PARITY_SF01.json
	python tools/parity_sf01.py PARITY_SF01.json

parity-hostile:  ## NULL/malformed-row + zero-row sweep -> HOSTILE_PARITY.json
	python tools/hostile_sweep.py HOSTILE_PARITY.json

scale-data:      ## seed-deterministic sf0.1/0.3/1 clones -> .scaledata/
	python tools/gen_scale_data.py 0.1
	python tools/gen_scale_data.py 0.3
	python tools/gen_scale_data.py 1.0

scale-curve:     ## per-query scaling exponents over the clones (r11)
	python tools/scale_curve.py --out SCALE_CURVE_r11.json

# sf1-only oracle exclusions (r9, reconstructed into the tree r10 for
# auditability): each profiled TIMEOUT>90s in DuckDB at the sf1 clone —
# SemDeDup per-cluster kernel, pagerank/triangle/two-hop recursive
# specs, pairwise containment/calibration specs. Their oracle checks
# stand at sf0.01/sf0.1; their ENGINE side is timed at sf1 by
# tools/scale_curve.py.
# r10 addition: q273 profiled 95.9s at sf1 (its oracle composes BOTH
# registered blocking chains plus the anchor ground truth — ~q271's
# 22s + q272's 59s + the exact pair scan); q271/q272 themselves stay IN.
PARITY_SF1_EXCLUDE = q121_semantic_dedup,q125_pagerank_dup_graph,q127_ngram_containment_pairs,q141_triangle_count,q142_weighted_pagerank,q146_benchmark_leak_report,q163_minhash_calibration,q179_dedup_cascade_agreement,q196_dedup_threshold_sweep,q206_corpus_containment,q208_skyline_pareto,q210_spatial_nn_join,q216_two_hop_reach,q269_dup_graph_triangles,q270_dup_graph_assortativity,q79_benchmark_decontamination,q273_near_dup_blocking_recall

parity-scale:    ## full oracle sweep at the sf1 clone (r11) — 10x sf0.1
	PARITY_EXTRA_EXCLUDE=$(PARITY_SF1_EXCLUDE) \
	  python tools/parity_sf01.py PARITY_SCALE_r11.json /root/repo/.scaledata/sf1

bench:           ## headline queries at sf0.1, one JSON line
	python bench.py

smoke:           ## driver-contract smoke (entry + registry shape)
	python -c "import importlib.util; \
	spec = importlib.util.spec_from_file_location('e', '__spark_entry__.py'); \
	m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m); \
	q, o = m.queries(), m.oracle_sql(); \
	print(len(q), 'queries,', len(o), 'oracles, subset:', set(o) <= set(q))"
