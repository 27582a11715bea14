#!/bin/sh
# ThreadSanitizer stress of the native host runtime (SURVEY.md §5.2).
set -e
cd "$(dirname "$0")/.."
g++ -O1 -g -fsanitize=thread -std=c++20 \
    signalizer_tpu/native/stress_test.cpp signalizer_tpu/native/host_runtime.cpp \
    -o /tmp/sz_stress -lpthread
TSAN_OPTIONS="halt_on_error=1" /tmp/sz_stress
echo "tsan stress: clean"
