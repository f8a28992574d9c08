#!/bin/sh
# Build the parity oracle against the UNMODIFIED reference at /root/reference.
# -ftrivial-auto-var-init=zero pins down the reference's uninitialized-stack
# read in InitBoardItems (see tools/oracle_dump.cpp header).
set -e
cd "$(dirname "$0")/.."
mkdir -p build
g++ -O2 -std=c++17 -ftrivial-auto-var-init=zero \
    -I/root/reference/include \
    tools/oracle_dump.cpp \
    /root/reference/src/bboard/bboard.cpp \
    /root/reference/src/bboard/step.cpp \
    /root/reference/src/bboard/step_utility.cpp \
    /root/reference/src/bboard/strategy.cpp \
    /root/reference/src/agents/simple_agent.cpp \
    /root/reference/src/agents/basic_agents.cpp \
    -o build/oracle_dump
echo "built build/oracle_dump"
