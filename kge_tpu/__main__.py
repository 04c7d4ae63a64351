from kge_tpu.cli import main

main()
