#!/bin/bash
# Alternating same-host bench: r11 tree (d4d0229) vs HEAD, 4 then 32 cores.
out=/tmp/r12/envelope.jsonl
for cycle in 1 2 3; do
  for cpus in 4 32; do
    for shape in r11 r12; do
      dir=/root/repo; [ $shape = r11 ] && dir=/tmp/r11tree
      line=$(cd $dir && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$cpus python bench.py 2>/dev/null | tail -1)
      echo "{\"cycle\": $cycle, \"cpus\": $cpus, \"shape\": \"$shape\", \"bench\": $line}" >> $out
    done
  done
done
echo DONE >> $out
