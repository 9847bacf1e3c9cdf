# Developer entry points. The Python package needs no build; `native` builds
# the C++ components (isclm trigram LM, libfstore gather) with graceful
# Python fallbacks when absent.
.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
