from smalltsdb_spark.cli import main

main()
