#!/bin/bash
# Resilient per-file suite runner: a flaky XLA-CPU segfault kills only one
# file's run, which is retried once. Results land in /tmp/suite/.
mkdir -p /tmp/suite
rm -f /tmp/suite/*.log /tmp/suite/RESULTS
cd /root/repo
for f in tests/test_*.py; do
  name=$(basename "$f" .py)
  tmo=1800
  case "$name" in
    # cold-cache interpret compiles of the o1 kernel body exceed 40
    # minutes on this 1-core host (warm runs are minutes)
    test_kernel_interpret_small) tmo=7200 ;;
  esac
  for attempt in 1 2; do
    timeout "$tmo" python -m pytest "$f" -x -q \
      >/tmp/suite/"$name".log 2>&1
    rc=$?
    if [ $rc -eq 0 ]; then
      echo "PASS $name (attempt $attempt)" >> /tmp/suite/RESULTS
      break
    elif [ $rc -ge 128 ] && [ $attempt -eq 1 ]; then
      echo "CRASH($rc) $name attempt 1 - retrying" >> /tmp/suite/RESULTS
      continue
    else
      echo "FAIL($rc) $name" >> /tmp/suite/RESULTS
      break
    fi
  done
done
echo DONE >> /tmp/suite/RESULTS
