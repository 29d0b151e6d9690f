{
  "targets": [
    {
      "target_name": "za2node",
      "sources": ["za2node.cc"],
      "libraries": ["-L<(module_root_dir)/../c", "-lza2c"],
      "cflags_cc": ["-std=c++17"]
    }
  ]
}
