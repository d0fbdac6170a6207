#!/bin/bash
# Run the test suite on CPU (virtual 8-device mesh), skipping the axon TPU
# tunnel registration that sitecustomize performs on interpreter start —
# tests never need the real chip and the tunnel serializes processes.
#
# Each test FILE runs in its own pytest process (2 in parallel): one
# process accumulating 300+ XLA CPU compilations has segfaulted inside
# backend_compile_and_load (LLVM stack depth); per-file isolation bounds
# compiler state, localizes any crash to one file, and halves wall clock
# on the 2-core host. Extra args are forwarded to every pytest invocation.
set -u
ulimit -s 65532 2>/dev/null

export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu

mkdir -p /tmp/hap_tpu_tests
rm -f /tmp/hap_tpu_tests/*.log /tmp/hap_tpu_tests/*.rc

run_one() {
    f="$1"; shift
    name=$(basename "$f" .py)
    python -m pytest "$f" -q "$@" > "/tmp/hap_tpu_tests/$name.log" 2>&1
    echo $? > "/tmp/hap_tpu_tests/$name.rc"
}

pids=""
n=0
for f in tests/test_*.py; do
    run_one "$f" "$@" &
    pids="$pids $!"
    n=$((n + 1))
    if [ $((n % 2)) -eq 0 ]; then
        wait $pids; pids=""
    fi
done
wait $pids 2>/dev/null

fail=0
for f in tests/test_*.py; do
    name=$(basename "$f" .py)
    rc=$(cat "/tmp/hap_tpu_tests/$name.rc" 2>/dev/null || echo 99)
    tail -n1 "/tmp/hap_tpu_tests/$name.log" | sed "s|^|$name: |"
    if [ "$rc" != "0" ] && [ "$rc" != "5" ]; then   # 5 = no tests collected
        fail=1
        echo "FAILED ($rc): $name — log: /tmp/hap_tpu_tests/$name.log"
    fi
done
exit $fail
