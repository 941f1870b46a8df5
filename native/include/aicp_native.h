/* C API of the AICP-TPU native runtime layer.
 *
 * TPU-native equivalents of the reference's C++ runtime components:
 *   - point-cloud file IO       (PCL PCD/PLY readers used via cloudIO.cpp,
 *                                app.cpp:269, app_ros.cpp:289)
 *   - scan accumulator          (aicp_ros/src/velodyne_accumulator.cpp)
 *   - sequence prefetcher       (replaces the synchronous per-frame load in
 *                                App::processFromFile, app.cpp:261-278, with
 *                                an ordered multi-threaded pipeline feeding
 *                                the TPU host buffers)
 *   - host voxel downsample     (pre-transfer reduction; semantics of the
 *                                VoxelGrid stage in filteringUtils.cpp:5-20)
 *
 * All functions are thread-compatible; a single handle must not be used from
 * two threads concurrently unless stated.
 */
#ifndef AICP_NATIVE_H
#define AICP_NATIVE_H

#ifdef __cplusplus
extern "C" {
#endif

/* ---------- file IO ----------
 * Readers return the number of points (>=0) and set *out_xyz to a
 * malloc-family buffer of n*3 floats (row-major xyz) that the caller must
 * release with aicp_buffer_free. Negative return = error:
 *   -1 open failed, -2 parse error, -3 unsupported format.
 */
long aicp_pcd_read(const char* path, float** out_xyz, double viewpoint[7]);
long aicp_ply_read(const char* path, float** out_xyz);
long aicp_kitti_bin_read(const char* path, float** out_xyz);
/* Auto-dispatch on extension (.pcd/.ply/.bin). viewpoint may be NULL. */
long aicp_cloud_read(const char* path, float** out_xyz, double viewpoint[7]);

/* binary: 0 ascii, 1 binary, 2 binary_compressed (LZF, PCL-compatible). */
int aicp_pcd_write(const char* path, const float* xyz, long n,
                   const double viewpoint[7], int binary);
void aicp_buffer_free(float* p);

/* ---------- LZF block codec (liblzf stream format; PCL binary_compressed
 * payloads). Return the output length, or -1 when out_cap is too small /
 * the stream is malformed. Compressed output can exceed the input by
 * ~1/32 + 1 bytes in the worst (incompressible) case. */
long aicp_lzf_compress(const unsigned char* in, long in_len,
                       unsigned char* out, long out_cap);
long aicp_lzf_decompress(const unsigned char* in, long in_len,
                         unsigned char* out, long out_cap);

/* ---------- host voxel downsample (centroid) ----------
 * Writes at most capacity points into out_xyz; returns the number written.
 * Deterministic: voxels are emitted in first-touch order of the input.
 */
long aicp_voxel_downsample(const float* xyz, long n, float voxel,
                           float* out_xyz, long capacity);

/* Fused voxel downsample + int16 fixed-point wire quantization (the
 * streaming drivers' per-frame wire prep in ONE native pass). out_q holds
 * capacity*3 int16 (tail zero-filled); returns the point count and fills
 * the per-axis dequantization scale/center: p = q * scale + center. */
long aicp_voxel_downsample_q16(const float* xyz, long n, float voxel,
                               short* out_q, long capacity,
                               float out_scale[3], float out_center[3]);

/* ---------- scan accumulator ----------
 * VelodyneAccumulatorConfig semantics (velodyne_accumulator.hpp:15-22):
 * batch_size scans per output cloud, [min_range, max_range] ball crop in the
 * sensor frame, each scan transformed into the odom frame and concatenated
 * (velodyne_accumulator.cpp:38-72).
 */
typedef struct AicpAccum AicpAccum;
AicpAccum* aicp_accum_create(long capacity, int batch_size,
                             float min_range, float max_range);
/* T_sensor_to_odom: 16 floats, row-major 4x4. Returns the number of points
 * retained from this scan, or -1 if the accumulator is already finished. */
long aicp_accum_push(AicpAccum* h, const float* xyz, long n,
                     const float* T_sensor_to_odom);
long aicp_accum_count(const AicpAccum* h);
int aicp_accum_finished(const AicpAccum* h);
/* Copies the accumulated cloud (odom frame) into out_xyz (>= count*3 floats)
 * and resets the accumulator. Returns the number of points copied. */
long aicp_accum_take(AicpAccum* h, float* out_xyz, long out_capacity);
void aicp_accum_clear(AicpAccum* h);
void aicp_accum_destroy(AicpAccum* h);

/* ---------- ordered multi-threaded sequence prefetcher ----------
 * n_threads workers read+parse files ahead of the consumer; items are
 * delivered strictly in path order. window bounds read-ahead (memory).
 * capacity: fixed padded point budget per cloud — larger clouds are
 * stride-subsampled to fit (deterministic). voxel > 0 applies
 * aicp_voxel_downsample before padding.
 */
typedef struct AicpPrefetch AicpPrefetch;
AicpPrefetch* aicp_prefetch_create(const char* const* paths, long n_paths,
                                   int n_threads, int window, long capacity,
                                   float voxel);
/* Blocks for the next item. out_xyz must hold capacity*3 floats; the tail
 * beyond the returned count is zero-filled. viewpoint may be NULL.
 * Returns the point count, -1 at end of sequence, -2 on read error (the
 * sequence continues; failed files are skipped with count -2). */
long aicp_prefetch_next(AicpPrefetch* h, float* out_xyz, double viewpoint[7],
                        long* out_index);
void aicp_prefetch_destroy(AicpPrefetch* h);

#ifdef __cplusplus
}
#endif
#endif /* AICP_NATIVE_H */
