# spark-graft developer entry points
.PHONY: test parity-driver-scale bench sim

test:            ## full gate at sf0.001 (~9 min)
	python -m pytest tests/ -q

parity-driver-scale:  ## every oracle at the driver's sf0.01
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_parity.py -q

bench:           ## headline JSON line at sf0.1
	python bench.py

sim:             ## one-shot driver-contract simulation (vanilla session)
	python scripts/driver_sim.py
