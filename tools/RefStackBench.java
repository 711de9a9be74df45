// Single-node baseline for the reference's engine layer: the
// commons-collections4 bloomfilter package (the library the reference
// builds on and delegates its hashing/cell work to — reference pom.xml
// dependency).  Measures single-thread insert and membership throughput
// of SimpleBloomFilter with EnhancedDoubleHasher, the exact code path of
// the reference's conformance layer (SURVEY.md Table B1/B10).
//
// Run:  java -cp <commons-collections4-4.5.0.jar> tools/RefStackBench.java
// (the reference's own novel class targets the pre-release 4.5-SNAPSHOT
// API and does not compile against the released 4.5.0 jar — see
// BENCH.md; this benchmark times the shared underlying engine instead.)

import org.apache.commons.collections4.bloomfilter.BloomFilter;
import org.apache.commons.collections4.bloomfilter.EnhancedDoubleHasher;
import org.apache.commons.collections4.bloomfilter.Shape;
import org.apache.commons.collections4.bloomfilter.SimpleBloomFilter;

public class RefStackBench {
    public static void main(String[] args) {
        int n = args.length > 0 ? Integer.parseInt(args[0]) : 2_000_000;
        // same sizing rule as the PySpark bench: fromNP(distinct, 1e-6)
        Shape shape = Shape.fromNP(Math.max(n / 50 * 16, 1 << 14), 1e-6);
        long[] h1 = new long[n];
        long[] h2 = new long[n];
        java.util.Random r = new java.util.Random(42);
        for (int i = 0; i < n; i++) { h1[i] = r.nextLong(); h2[i] = r.nextLong(); }

        for (int rep = 0; rep < 3; rep++) {
            SimpleBloomFilter bf = new SimpleBloomFilter(shape);
            long t0 = System.nanoTime();
            for (int i = 0; i < n; i++) {
                bf.merge(new EnhancedDoubleHasher(h1[i], h2[i]));
            }
            double insSec = (System.nanoTime() - t0) / 1e9;

            long t1 = System.nanoTime();
            int hits = 0;
            for (int i = 0; i < n; i++) {
                if (bf.contains(new EnhancedDoubleHasher(h1[i], h2[i]))) hits++;
            }
            double qrySec = (System.nanoTime() - t1) / 1e9;
            System.out.printf(
                "rep%d: n=%d m=%d k=%d insert=%.3fs (%.0f items/s) "
                + "contains=%.3fs (%.0f probes/s) hits=%d%n",
                rep, n, shape.getNumberOfBits(), shape.getNumberOfHashFunctions(),
                insSec, n / insSec, qrySec, n / qrySec, hits);
        }

        // end-to-end-ish variant: hash REAL item bytes (murmur128 inside
        // EnhancedDoubleHasher(byte[])) the way a driver program would
        for (int rep = 0; rep < 2; rep++) {
            SimpleBloomFilter bf = new SimpleBloomFilter(shape);
            long t0 = System.nanoTime();
            for (int i = 0; i < n; i++) {
                byte[] item = ("conv-" + (i % (n / 50)) + ":tool_"
                               + (i % 12)).getBytes();
                bf.merge(new EnhancedDoubleHasher(item));
            }
            double s = (System.nanoTime() - t0) / 1e9;
            System.out.printf(
                "rep%d (hash item bytes): insert=%.3fs (%.0f items/s)%n",
                rep, s, n / s);
        }
    }
}
