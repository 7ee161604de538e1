# Build / test entry points (counterpart of the reference's Makefile targets
# build / python-tests / integration-tests).

.PHONY: all native protos test bench clean

all: native protos

native:
	$(MAKE) -C native

protos:
	./scripts/gen_protos.sh

test: native
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
