{
  "targets": [
    {
      "target_name": "tokenizers_tpu",
      "sources": ["src/binding.cc"],
      "include_dirs": [],
      "libraries": ["<!(python3 -c \"from tokenizers_tpu.native import build_c_api; print(build_c_api())\")"],
      "cflags_cc": ["-std=c++17", "-fexceptions"],
      "defines": ["NAPI_VERSION=8"],
      "conditions": [
        ["OS=='linux'", {
          "ldflags": [
            "-Wl,-rpath,<!(python3 -c \"import os; from tokenizers_tpu.native import build_c_api; print(os.path.dirname(build_c_api()))\")",
            "-Wl,-rpath,<!(python3 -c \"import sysconfig; print(sysconfig.get_config_var('LIBDIR'))\")"
          ]
        }]
      ]
    }
  ]
}
