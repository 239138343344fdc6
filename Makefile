# Build the native ingest accelerators and run the test suite
# (the reference's `make && make test`, Makefile:1-38, for this framework).

all: native

native:
	$(MAKE) -C csrc

test: native
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	$(MAKE) -C csrc clean

.PHONY: all native test bench clean
