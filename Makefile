# Entry points. `make parity` runs EVERY BASELINE.md accuracy config —
# each test is gated on its dataset being mounted (zero egress in this
# environment) and skips with instructions otherwise:
#   GLT_CORA_RAW / GLT_CORA_DATA        Cora EgoSAGE ACC >= 0.78
#   GLT_OGBL_DATA                        ogbl-collab SEAL hits@50 >= 0.45
#   GLT_PRODUCTS_RAW / GLT_PRODUCTS_DATA ogbn-products EgoSAGE ACC >= 0.75
# Data prep: examples/data/{cora,ogbl_collab,ogbn_products}.py

.PHONY: test parity bench

test:
	python -m pytest tests/ -x -q

parity:
	python -m pytest tests/test_real_datasets.py -q -rs -k "parity"

bench:
	python bench.py
