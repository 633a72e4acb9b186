// Interop harness: a tiny CLI over the REFERENCE findb crate (built
// from a patched copy by RustInteropSpec) so the reference's own
// write_from_iterator / BTree::query can be driven against stores the
// Spark-side writers produced, and vice versa. This file is graft
// test code, not reference code.
use findb::btree::file::{read_csv, BTree, Query};
use std::fs::File;

fn main() {
    let args: Vec<String> = std::env::args().collect();
    match args[1].as_str() {
        "write" => {
            let mut it = read_csv(&args[3]);
            BTree::write_from_iterator(&args[2], args[4].parse().unwrap(), &mut it).unwrap();
        }
        "dump" => {
            let file = File::open(&args[2]).unwrap();
            let mut bt = BTree::from_file(file, 64).unwrap();
            bt.print().unwrap();
        }
        "query" => {
            let file = File::open(&args[2]).unwrap();
            let mut bt = BTree::from_file(file, 64).unwrap();
            let mut it = bt
                .query(Query {
                    id: 0,
                    asset_id: args[3].parse().unwrap(),
                    start_date: args[4].parse().unwrap(),
                    end_date: args[5].parse().unwrap(),
                    timestamp: args[6].parse().unwrap(),
                })
                .unwrap();
            while let Some(r) = it.next() {
                println!("{}", r.unwrap().csv_line());
            }
        }
        other => panic!("unknown command: {}", other),
    }
}
