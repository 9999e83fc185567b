#!/usr/bin/env bash
# Stage-7 stub (round 5). The original hardimg20k leg was confounded
# (ADVICE r4: image-mode varied TOGETHER with the noise recipe, so the
# ablation could not isolate ray sampling) and the whole hard-scene
# question moved to the round-5 research loop: a cheap 5k-step grid
# search over image-mode x noise-scale x model family
# (benchmarks/hardscene_r5.sh) before any 20k budget is committed.
# Skipping here frees ~30 min of single-chip time for that loop.
echo "hardfix stage folded into the round-5 hard-scene research loop"
echo HARDFIX_DONE
