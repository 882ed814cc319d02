#!/bin/sh
# Compile-check the N-API addon without a Node toolchain.
#
# vendor/node_api.h is a declaration-only transcription of the stable
# N-API v8 surface binding.cc uses (see its header comment); a full
# syntax+type check against it catches signature drift and type errors.
# Real builds use node-gyp with the genuine headers:
#
#     npm install && npx node-gyp rebuild     # requires node >= 14
#     npx jest                                # runs lib/*.test.js
set -e
cd "$(dirname "$0")"
${CXX:-g++} -fsyntax-only -std=c++17 -Wall -Wextra -I vendor src/binding.cc
echo "binding.cc: syntax/type check OK (N-API v8 declarations)"
