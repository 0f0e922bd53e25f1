# Convenience targets (reference analog: Makefile, whose `run` target
# renders scenes/sample.pbrt and collects the EXRs into output/).
SCENE ?= /root/reference/scenes/sample.pbrt

.PHONY: run test bench cat

run:
	mkdir -p output
	python -m tpurt.cli $(SCENE) --outfile output/$(notdir $(basename $(SCENE))).exr

test:
	python -m pytest tests/ -q

bench:
	python bench.py

cat:
	python -m tpurt.cli --cat $(SCENE)
